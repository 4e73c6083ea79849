"""Streaming CUSUM monitor: batch parity with the pure recursion,
per-batch state versioning, carry-forward for absent series, and
checkpoint-replay idempotence (a re-run batch rewrites byte-identical
state instead of double-applying its observation)."""

from __future__ import annotations

import datetime as dt
import glob
import os
import shutil


SCHEMA = (
    "event_id long, user_id long, ts timestamp, event_type string, "
    "value double"
)


def _rows(n, day, etype, scale):
    return [
        (day * 1000 + i, 1, dt.datetime(2024, 1, day, i % 24), etype,
         float(scale))
        for i in range(n)
    ]


def _mk_stream_dir(spark, src, batches):
    os.makedirs(src)
    for tag, rows in batches:
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(
            os.path.join(src, tag)
        )
    for i, f in enumerate(sorted(glob.glob(os.path.join(src, "*", "*.parquet")))):
        shutil.move(f, os.path.join(src, f"batch_{i}.parquet"))
    for tag, _ in batches:
        shutil.rmtree(os.path.join(src, tag))


def _run_monitor(spark, tmp_path, sub, batches, params_rows):
    from magi_etl_spark.streaming.events_stream import (
        run_foreach_batch_cusum_monitor,
    )

    src = str(tmp_path / f"src_{sub}")
    _mk_stream_dir(spark, src, batches)
    params = str(tmp_path / f"params_{sub}")
    spark.createDataFrame(
        params_rows, "series string, k long, h long"
    ).write.parquet(params)
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    mon = str(tmp_path / f"mon_{sub}")
    run_foreach_batch_cusum_monitor(
        stream, params, mon, str(tmp_path / f"ckpt_{sub}")
    )
    return mon, src, params


def _state(spark, mon):
    from magi_etl_spark.streaming.events_stream import read_cusum_monitor

    return {
        (r.batch, r.series): (r.cusum_pos, r.cusum_neg, r.alarm)
        for r in read_cusum_monitor(spark, mon).collect()
    }


def test_cusum_monitor_matches_python_recursion(spark, tmp_path):
    # three batches of series "t": totals 100*100c, 100*100c, 100*300c
    batches = [
        ("a", _rows(100, 10, "t", 1.0)),
        ("b", _rows(100, 11, "t", 1.0)),
        ("c", _rows(100, 12, "t", 3.0)),
    ]
    k, h = 10000, 5000
    mon, _, _ = _run_monitor(
        spark, tmp_path, "parity", batches, [("t", k, h)]
    )
    got = _state(spark, mon)
    xs = [10000, 10000, 30000]
    sp = sn = 0
    for b, x in enumerate(xs):
        sp = max(0, sp + x - k)
        sn = max(0, sn + k - x)
        alarm = 1 if (sp > h or sn > h) else 0
        assert got[(b, "t")] == (sp, sn, alarm), (b, got[(b, "t")])
    # the level shift in batch 2 must alarm
    assert got[(2, "t")][2] == 1


def test_cusum_monitor_carries_absent_series_forward(spark, tmp_path):
    batches = [
        ("a", _rows(50, 10, "t", 2.0) + _rows(30, 10, "u", 1.0)),
        ("b", _rows(50, 11, "t", 2.0)),  # no "u" rows
    ]
    mon, _, _ = _run_monitor(
        spark, tmp_path, "carry", batches,
        [("t", 10000, 99999), ("u", 1000, 99999)],
    )
    got = _state(spark, mon)
    # u: batch 0 -> sp = max(0, 3000-1000) = 2000; batch 1 carries it
    assert got[(0, "u")][0] == 2000
    assert got[(1, "u")] == got[(0, "u")]


def test_cusum_monitor_replay_is_idempotent(spark, tmp_path):
    """Re-running the last batch (fresh checkpoint, same state dir)
    must rewrite batch=N identically, not double-apply."""
    from magi_etl_spark.streaming.events_stream import (
        run_foreach_batch_cusum_monitor,
    )

    batches = [
        ("a", _rows(100, 10, "t", 1.0)),
        ("b", _rows(100, 11, "t", 3.0)),
    ]
    mon, src, params = _run_monitor(
        spark, tmp_path, "replay", batches, [("t", 10000, 5000)]
    )
    before = _state(spark, mon)
    # replay: a fresh checkpoint re-delivers both files as batch 0/1;
    # each re-run batch reads its ORIGINAL predecessor state dir and
    # overwrites its own
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    run_foreach_batch_cusum_monitor(
        stream, params, mon, str(tmp_path / "ckpt_replay2")
    )
    after = _state(spark, mon)
    assert after == before
