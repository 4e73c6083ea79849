"""Schedule → UTC crontab conversion, incl. DST boundaries (reference
``dash_app.py:1311-1357``)."""

from __future__ import annotations

import datetime as dt

from magi_etl_spark.schedule import run_once_crontab, schedule_to_crontab


def test_daily_dst_boundary():
    sched = {"frequency": 0, "hour": 0, "minute": 30}
    # EST (UTC-5): Jan 15
    assert schedule_to_crontab(sched, "America/New_York", dt.date(2025, 1, 15)) == "30 5 * * *"
    # EDT (UTC-4): Jul 15 — same local schedule, different UTC hour
    assert schedule_to_crontab(sched, "America/New_York", dt.date(2025, 7, 15)) == "30 4 * * *"


def test_weekly_midnight_crossing_shifts_dow():
    # Monday 22:00 New York (EST) = Tuesday 03:00 UTC
    sched = {"frequency": 1, "hour": 22, "minute": 0, "day_of_week": 0}
    out = schedule_to_crontab(sched, "America/New_York", dt.date(2025, 1, 15))
    assert out == "0 3 * * 2"  # cron Sunday=0 -> Tuesday = 2
    # Same schedule in UTC tz: no crossing, Monday stays Monday (cron 1)
    assert schedule_to_crontab(sched, "UTC", dt.date(2025, 1, 15)) == "0 22 * * 1"


def test_weekly_honors_configured_day():
    # Friday(4, Monday=0) 09:00 Tokyo = Friday 00:00 UTC, cron dow 5
    sched = {"frequency": 1, "hour": 9, "minute": 0, "day_of_week": 4}
    assert schedule_to_crontab(sched, "Asia/Tokyo", dt.date(2025, 3, 1)) == "0 0 * * 5"


def test_monthly_keeps_local_dom():
    sched = {"frequency": 2, "hour": 6, "minute": 15, "day_of_month": 1}
    assert schedule_to_crontab(sched, "America/New_York", dt.date(2025, 1, 15)) == "15 11 1 * *"


def test_run_once_next_minute():
    now = dt.datetime(2025, 6, 1, 23, 59, 30, tzinfo=dt.timezone.utc)
    assert run_once_crontab(now=now) == "0 0 2 6 *"  # rolls into next day


def test_spring_forward_nonexistent_local_time():
    # 2:30 America/New_York does not exist on 2025-03-09 (spring forward);
    # zoneinfo folds it forward — conversion still yields a valid crontab.
    sched = {"frequency": 0, "hour": 2, "minute": 30}
    out = schedule_to_crontab(sched, "America/New_York", dt.date(2025, 3, 9))
    minute, hour, dom, mon, dow = out.split()
    assert (minute, dom, mon, dow) == ("30", "*", "*", "*") and hour in {"6", "7"}
