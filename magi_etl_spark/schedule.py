"""Schedule → UTC crontab conversion (scheduler shim).

The reference UI stores job schedules as ``{frequency, hour, minute,
day_of_week, day_of_month}`` in a display timezone and converts them to
UTC celery crontabs at registration time
(``/root/reference/dash_app/dash_app.py:1311-1357``).  Here the same
conversion emits a standard 5-field crontab string so the ``jobs.py``
CLI can be driven by any cron daemon.

Intent deviations from the reference (documented, deliberate):

* Weekly schedules honor the configured ``day_of_week`` — the reference
  passes ``utc_scheduled_time.weekday()``, i.e. *today's* weekday at
  conversion time (``dash_app.py:1347``), so its weekly jobs drift with
  whenever the process happened to restart.
* The emitted day-of-week uses standard cron numbering (0=Sunday);
  the input uses the reference's Monday=0 convention.  The reference
  passes Monday=0 values straight into celery's Sunday=0 crontab,
  shifting every weekly job by a day.
"""

from __future__ import annotations

import datetime as dt
from zoneinfo import ZoneInfo

DAILY, WEEKLY, MONTHLY = 0, 1, 2


def schedule_to_crontab(
    schedule: dict,
    tz: str = "UTC",
    on_date: dt.date | None = None,
) -> str:
    """Convert a UI schedule to a UTC 5-field crontab string.

    ``schedule``: ``frequency`` (0=daily, 1=weekly, 2=monthly), local
    ``hour``/``minute``, ``day_of_week`` (Monday=0, reference
    convention), ``day_of_month``.

    DST: the local→UTC offset is anchored on ``on_date`` (default: today
    in ``tz``), matching the reference's ``datetime.now()``-anchored
    behavior — a schedule converted during daylight time differs by an
    hour from one converted during standard time, so re-run the
    conversion at deploy time (the reference recomputes on each process
    start).  When the UTC conversion crosses midnight, the weekly
    day-of-week shifts with it.
    """
    zone = ZoneInfo(tz)
    anchor = on_date or dt.datetime.now(zone).date()
    local = dt.datetime(
        anchor.year,
        anchor.month,
        anchor.day,
        int(schedule["hour"]),
        int(schedule["minute"]),
        tzinfo=zone,
    )
    utc = local.astimezone(dt.timezone.utc)
    day_shift = (utc.date() - local.date()).days
    freq = int(schedule["frequency"])
    if freq == DAILY:
        return f"{utc.minute} {utc.hour} * * *"
    if freq == WEEKLY:
        # input Monday=0  ->  cron Sunday=0, plus any midnight crossing
        cron_dow = (int(schedule["day_of_week"]) + day_shift + 1) % 7
        return f"{utc.minute} {utc.hour} * * {cron_dow}"
    if freq == MONTHLY:
        # day_of_month stays in local terms (reference behavior): a pure
        # crontab can't express "local day N minus one day" portably.
        return f"{utc.minute} {utc.hour} {int(schedule['day_of_month'])} * *"
    raise ValueError(f"unknown frequency {schedule['frequency']!r}")


def run_once_crontab(
    tz: str = "UTC", now: dt.datetime | None = None, delay_minutes: int = 1
) -> str:
    """One-shot schedule: fire ``delay_minutes`` from now, converted to a
    UTC crontab (reference ``run_once`` branch, ``dash_app.py:1315``).
    The caller is responsible for de-registering after the first run,
    as with the reference's celery one-shot."""
    utc_now = (now or dt.datetime.now(dt.timezone.utc)).astimezone(dt.timezone.utc)
    at = utc_now + dt.timedelta(minutes=delay_minutes)
    return f"{at.minute} {at.hour} {at.day} {at.month} *"
