"""Streaming drift monitor: per-micro-batch PSI against a persisted
baseline histogram, exactly-once per-batch score writes, and parity
with the batch operator on the same data."""

from __future__ import annotations

import datetime as dt
import glob
import shutil


def _rows(values, day, etype="t"):
    return [
        (i, 1, dt.datetime(2024, 1, day, i % 24), etype, float(v))
        for i, v in enumerate(values)
    ]


SCHEMA = (
    "event_id long, user_id long, ts timestamp, event_type string, "
    "value double"
)


def test_drift_monitor_scores_each_batch(spark, tmp_path):
    from magi_etl_spark.operators.drift import bin_counts, psi_between
    from magi_etl_spark.streaming.events_stream import (
        read_drift_monitor,
        run_foreach_batch_drift_monitor,
        write_drift_baseline,
    )

    baseline_vals = [5.0, 50.0, 150.0, 340.0] * 50
    write_drift_baseline(
        spark.createDataFrame(_rows(baseline_vals, 1), SCHEMA),
        str(tmp_path / "baseline"),
    )

    # batch 0 matches the baseline distribution; batch 1 is shifted
    same = _rows(baseline_vals, 10)
    shifted = _rows([330.0] * 200, 11)
    src = tmp_path / "events"
    src.mkdir()
    for tag, rows in (("a", same), ("b", shifted)):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(
            str(src / tag)
        )
    for i, f in enumerate(sorted(glob.glob(str(src / "*" / "*.parquet")))):
        shutil.move(f, str(src / f"batch_{i}.parquet"))
    shutil.rmtree(src / "a"), shutil.rmtree(src / "b")

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    monitor = str(tmp_path / "monitor")
    ckpt = str(tmp_path / "ckpt")
    run_foreach_batch_drift_monitor(
        stream, str(tmp_path / "baseline"), monitor, ckpt
    )

    out = {
        r["batch"]: r for r in read_drift_monitor(spark, monitor).collect()
    }
    assert set(out) == {0, 1}
    assert out[0]["psi"] < 0.05  # same distribution: negligible drift
    assert out[1]["psi"] > 0.5  # mass collapsed into one bin: loud drift
    assert out[1]["n_cur"] == 200

    # parity with the batch operator on the same data
    base_counts = spark.read.parquet(str(tmp_path / "baseline"))
    cur = bin_counts(
        spark.createDataFrame(shifted, SCHEMA),
        "event_type", "value", 0.0, 350.0, 10,
    )
    batch_psi = psi_between(base_counts, cur, "event_type", 10).collect()[0]
    assert batch_psi["psi"] == out[1]["psi"]

    # replay with no new input: checkpoint makes it a no-op, and the
    # per-batch overwrite would make even a replayed batch idempotent
    stream2 = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    run_foreach_batch_drift_monitor(
        stream2, str(tmp_path / "baseline"), monitor, ckpt
    )
    assert read_drift_monitor(spark, monitor).count() == 2
