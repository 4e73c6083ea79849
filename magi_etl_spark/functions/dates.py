"""Date/time Column helpers (SURVEY.md §2.8 date functions).

Engine-side equivalents of the reference's pandas date utilities, all
pure Column expressions so they compose into pushdown-friendly plans.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def reassemble_date(year: Column, month: Column, day: Column) -> Column:
    """``cast(concat(year,'-',month,'-',day) as date)`` partition-column
    reassembly (reference ``dash_app/tasks.py:600``).  NULL-propagating
    concat: any NULL part -> NULL date (Presto parity)."""
    return F.to_date(F.concat(year, F.lit("-"), month, F.lit("-"), day))


def date_intervals(start: Column, end: Column, interval: str = "1 day") -> Column:
    """Inclusive date-bucket array (reference ``gen_date_intervals``,
    ``biutils.py:117-141``) via ``sequence`` — explode for one row per
    bucket."""
    return F.sequence(start.cast("date"), end.cast("date"), F.expr(f"INTERVAL {interval}"))


def convert_tz(ts: Column, from_tz: str, to_tz: str) -> Column:
    """Timezone conversion (reference ``conv_tz``, ``biutils.py:243-248``):
    interpret ``ts`` as wall-clock in ``from_tz``, emit wall-clock in
    ``to_tz``."""
    return F.from_utc_timestamp(F.to_utc_timestamp(ts, from_tz), to_tz)


def first_day_of_iso_week(year: Column, week: Column) -> Column:
    """Monday of ISO (year, week) (reference ``biutils.py:250-255``).

    Jan 4 is always in ISO week 1; step back to its Monday and add the
    week offset."""
    jan4 = F.make_date(year, F.lit(1), F.lit(4))
    week1_monday = F.date_sub(jan4, F.dayofweek(jan4) + 5)  # Mon=2 in dayofweek
    # dayofweek: Sun=1..Sat=7; Monday offset = (dayofweek+5) % 7
    week1_monday = F.date_sub(jan4, (F.dayofweek(jan4) + F.lit(5)) % 7)
    return F.date_add(week1_monday, (week - 1) * 7)


def seconds_between(a: Column, b: Column) -> Column:
    """``date_diff('second', a, b)`` (reference ``dash_app/tasks.py:
    1989-1993``) as second-boundary crossings (floor-then-diff)."""
    return F.unix_timestamp(b) - F.unix_timestamp(a)


def linear_bins(value: Column, mn: Column, mx: Column, n_bins: int) -> Column:
    """Equal-width bin index in [0, n_bins-1] (reference color-scale
    binning, ``biutils.py:143-218``): degenerate ranges collapse to bin 0,
    the max lands in the last bin."""
    width = (mx - mn) / F.lit(float(n_bins))
    idx = F.floor((value - mn) / width).cast("int")
    return (
        F.when(mx == mn, F.lit(0))
        .otherwise(F.least(F.greatest(idx, F.lit(0)), F.lit(n_bins - 1)))
    )
