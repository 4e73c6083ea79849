"""Checkpointed foreachBatch upsert sink: exactly-once at the batch level
(reprocessing the same input is a no-op) and incremental merge of new
files."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F


def test_foreach_batch_upsert_checkpointed(spark, sf_dir, tmp_path):
    from magi_etl_spark.streaming.events_stream import (
        run_foreach_batch_upsert,
        stream_events,
    )

    src = tmp_path / "src"
    src.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", src / "a.parquet")
    target = str(tmp_path / "target")
    ckpt = str(tmp_path / "ckpt")

    def consume_stateless():
        run_foreach_batch_upsert(
            stream_events(spark, str(src)).select("event_id", "user_id", "value"),
            target, ckpt, keys=["event_id"],
        )

    consume_stateless()
    n1 = spark.read.parquet(target).count()
    expected = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert n1 == expected

    # rerun with no new input: checkpoint makes it a no-op (no duplicates)
    consume_stateless()
    assert spark.read.parquet(target).count() == n1

    # add a new file: only the delta merges in
    extra = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select((F.col("event_id") + 1_000_000).alias("event_id"), "user_id", "value")
        .limit(10)
    )
    import pyarrow as pa
    import pyarrow.parquet as pq

    pdf = extra.toPandas()
    # craft a file matching EVENTS_NS_SCHEMA (event_id, ts, user_id, ...)
    table = pa.table(
        {
            "event_id": pa.array(pdf["event_id"], pa.int64()),
            "ts": pa.array([0] * len(pdf), pa.int64()),
            "user_id": pa.array(pdf["user_id"], pa.int64()),
            "event_type": pa.array(["click"] * len(pdf), pa.string()),
            "value": pa.array(pdf["value"], pa.float64()),
            "props": pa.array(["{}"] * len(pdf), pa.string()),
        }
    )
    pq.write_table(table, src / "b.parquet")
    consume_stateless()
    assert spark.read.parquet(target).count() == n1 + 10


def test_foreach_batch_upsert_cleans_staging(spark, sf_dir, tmp_path):
    """The stage-then-swap commit must not leave .staging/.old dirs behind
    (they would grow stale data), and a promoted staging copy must be
    recovered on restart."""
    import os

    from magi_etl_spark.streaming.events_stream import (
        run_foreach_batch_upsert,
        stream_events,
    )

    src = tmp_path / "src"
    src.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", src / "a.parquet")
    target = str(tmp_path / "target")

    run_foreach_batch_upsert(
        stream_events(spark, str(src)).select("event_id", "user_id", "value"),
        target, str(tmp_path / "ckpt"), keys=["event_id"],
    )
    assert os.path.exists(target)
    assert not os.path.exists(target + ".staging")
    assert not os.path.exists(target + ".old")
    n = spark.read.parquet(target).count()

    # simulate a crash between the two commit renames: target gone,
    # staging holds the good copy — the next batch must recover it
    os.rename(target, target + ".staging")
    shutil.copy(f"{sf_dir}/events.parquet", src / "c.parquet")
    run_foreach_batch_upsert(
        stream_events(spark, str(src)).select("event_id", "user_id", "value"),
        target, str(tmp_path / "ckpt"), keys=["event_id"],
    )
    assert spark.read.parquet(target).count() == n
    assert not os.path.exists(target + ".staging")
