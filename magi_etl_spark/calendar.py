"""AnchorCalendar — calendar-anchored period derivations with an
*injectable* anchor date.

Field-for-field parity with the reference (``biutils.py:467-483``), minus
its hardwired ``datetime.now()`` default (SURVEY.md §7.4.5: nondeterminism
made injectable).  Weeks are ISO (Monday start); "latest complete" periods
are relative to the anchor.
"""

from __future__ import annotations

from datetime import date, datetime, timedelta


def _to_date(d: date | datetime | str) -> date:
    if isinstance(d, datetime):
        return d.date()
    if isinstance(d, date):
        return d
    return date.fromisoformat(str(d)[:10])


def _add_months(d: date, months: int) -> date:
    """Month offset with end-of-month clamping (pandas DateOffset parity)."""
    m = d.month - 1 + months
    y = d.year + m // 12
    m = m % 12 + 1
    # clamp day to the target month's length
    if m == 12:
        nxt = date(y + 1, 1, 1)
    else:
        nxt = date(y, m + 1, 1)
    last_day = (nxt - timedelta(days=1)).day
    return date(y, m, min(d.day, last_day))


class AnchorCalendar:
    def __init__(self, anchor_date: date | datetime | str):
        a = _to_date(anchor_date)
        self.current_date = a
        self.latest_date = a - timedelta(days=1)
        self.current_quarter = (a.month - 1) // 3 + 1
        self.last_quarter = self.current_quarter - 1 if self.current_quarter != 1 else 4
        self.latest_complete_month_start = _add_months(a, -1).replace(day=1)
        self.latest_complete_month_end = _add_months(
            self.latest_complete_month_start, 1
        ) - timedelta(days=1)
        self.current_month_start = self.latest_date.replace(day=1)
        self.current_month_end = _add_months(
            self.latest_date.replace(day=1), 1
        ) - timedelta(days=1)
        self.latest_complete_week_start = (
            a - timedelta(days=a.isoweekday() - 1) - timedelta(days=7)
        )
        self.latest_complete_week_end = self.latest_complete_week_start + timedelta(days=6)
        self.current_week_start = a - timedelta(days=a.isoweekday() - 1)
        self.current_week_end = self.current_week_start + timedelta(days=6)
        self.mom = _add_months(a, -1)
        self.yoy = _add_months(a, -12)

    def rolling_window(self, days: int = 30) -> tuple[date, date]:
        """[latest_date - (days-1), latest_date] — the reference's 30-day
        window (``date_add('day', -29, anchor)``, ``dash_app/tasks.py:585``)."""
        return self.latest_date - timedelta(days=days - 1), self.latest_date

    def benchmark_days(self, n_weeks: int = 4) -> list[date]:
        """Same-weekday comparison days: latest_date - 7k, k=1..n (the
        trending benchmark, ``dash_app/tasks.py:1776-1781``, implemented as
        the documented intent: ``date IN (d-7, d-14, d-21, d-28)``)."""
        return [self.latest_date - timedelta(days=7 * k) for k in range(1, n_weeks + 1)]
