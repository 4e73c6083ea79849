"""RunTelemetry vs the reference's Redis start/end_run_status contract
(/root/reference/dash_app/callbacks.py:103-136)."""

import pytest

from magi_etl_spark.telemetry import (
    ACTIVE_TTL_SECONDS,
    KEEP_DURATIONS,
    LINGER_SECONDS,
    MemoryKV,
    RunTelemetry,
)


class FakeClock:
    def __init__(self, t=1000.0):
        self.t = t

    def __call__(self):
        return self.t


def make():
    clock = FakeClock()
    return RunTelemetry(store=MemoryKV(clock=clock), clock=clock), clock


def test_average_of_last_five_runs():
    t, clock = make()
    # 8 runs with durations 10, 20, ..., 80
    for i in range(8):
        t.start_run("trending", f"r{i}")
        clock.t += (i + 1) * 10
        assert t.end_run("trending", f"r{i}") == (i + 1) * 10
    # only the most recent KEEP_DURATIONS (=5) survive: 40..80
    assert KEEP_DURATIONS == 5
    assert t.average_duration("trending") == pytest.approx((40 + 50 + 60 + 70 + 80) / 5)
    # a new run's status payload carries that ETA
    payload = t.start_run("trending", "next")
    assert payload["average_duration"] == pytest.approx(60.0)


def test_first_run_has_zero_eta_and_status_roundtrip():
    t, clock = make()
    payload = t.start_run("helix", "run-1", progress=["step 1", "step 2"])
    assert payload["average_duration"] == 0.0
    got = t.status("helix", "run-1")
    assert got["progress_list_values"] == ["step 1", "step 2"]
    assert got["init_time"] == clock.t


def test_status_ttl_and_post_run_linger():
    t, clock = make()
    t.start_run("trending", "r1")
    clock.t += ACTIVE_TTL_SECONDS + 1  # active key expires after 30 min
    assert t.status("trending", "r1") is None
    with pytest.raises(KeyError):
        t.end_run("trending", "r1")

    t.start_run("trending", "r2")
    clock.t += 120
    t.end_run("trending", "r2")
    assert t.status("trending", "r2") is not None  # lingers for the UI
    clock.t += LINGER_SECONDS + 1
    assert t.status("trending", "r2") is None


def test_tool_keys_isolated_and_track_contextmanager():
    t, clock = make()
    with t.track("trending", "a"):
        clock.t += 30
    with t.track("monetization", "b"):
        clock.t += 300
    assert t.average_duration("trending") == 30
    assert t.average_duration("monetization") == 300
