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


def test_streaming_dedup_matches_batch(spark, sf_dir, tmp_path):
    """dropDuplicatesWithinWatermark over the file stream keeps one row
    per key even when duplicates arrive in separate micro-batches, and
    matches the batch dropDuplicates survivor set."""
    from magi_etl_spark.streaming.events_stream import (
        run_to_memory_append,
        stream_events,
        streaming_dedup,
    )

    src = tmp_path / "src"
    src.mkdir()
    # same file twice: every event_id arrives in two different micro-batches
    shutil.copy(f"{sf_dir}/events.parquet", src / "a.parquet")
    shutil.copy(f"{sf_dir}/events.parquet", src / "b.parquet")
    stream = stream_events(spark, str(src), max_files_per_trigger=1)
    run_to_memory_append(
        streaming_dedup(stream, ["event_id"], watermark="365 days"), "dedup_out"
    )
    got = spark.table("dedup_out")
    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    assert got.count() == batch.select("event_id").distinct().count()
    assert got.groupBy("event_id").count().where(F.col("count") > 1).count() == 0


def test_stream_events_ts_unit_override(spark, sf_dir, tmp_path):
    """An empty landing directory can't be sniffed: the explicit ts_unit
    pin declares the eventual writer's layout up front."""
    import pytest

    from magi_etl_spark.streaming.events_stream import stream_events

    empty = tmp_path / "landing"
    empty.mkdir()
    ns_stream = stream_events(spark, str(empty), ts_unit="ns_long")
    assert ns_stream.isStreaming
    assert dict(ns_stream.dtypes)["ts"] == "timestamp"  # converted ns-long

    native = stream_events(spark, str(empty), ts_unit="timestamp")
    assert dict(native.dtypes)["ts"] == "timestamp"

    with pytest.raises(ValueError, match="ts_unit"):
        stream_events(spark, str(empty), ts_unit="seconds")


def test_stream_stream_join_matches_batch(spark, tmp_path):
    """Watermarked interval join across two file streams equals the batch
    join with the same predicate."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from magi_etl_spark.streaming.events_stream import (
        run_to_memory_append,
        stream_events,
        stream_stream_join,
    )

    base = 1_700_000_000_000_000_000  # epoch ns
    hour = 3_600_000_000_000

    def write(dirname, rows):
        d = tmp_path / dirname
        d.mkdir()
        ids, ts, users = zip(*rows)
        table = pa.table(
            {
                "event_id": pa.array(ids, pa.int64()),
                "ts": pa.array([base + t * hour for t in ts], pa.int64()),
                "user_id": pa.array(users, pa.int64()),
                "event_type": pa.array(["x"] * len(rows)),
                "value": pa.array([1.0] * len(rows)),
                "props": pa.array(["{}"] * len(rows)),
            }
        )
        pq.write_table(table, d / "part.parquet")
        return str(d)

    # views at hour h, clicks possibly within the 1h window after
    views = write("views", [(1, 0, 10), (2, 0, 20), (3, 5, 30)])
    clicks = write(
        "clicks",
        [
            (101, 0, 10),   # same hour as view 1 -> match
            (102, 2, 20),   # 2h after view 2 -> outside 1h window
            (103, 5, 30),   # same hour as view 3 -> match
            (104, 0, 99),   # no view for this user
        ],
    )
    joined = stream_stream_join(
        stream_events(spark, views),
        stream_events(spark, clicks),
        key="user_id",
        within="1 hour",
    )
    run_to_memory_append(joined, "ss_join_out")
    got = sorted(r.user_id for r in spark.table("ss_join_out").collect())
    assert got == [10, 30]


def test_foreach_batch_cdc_merge(spark, tmp_path):
    """CDC merge sink: tombstones survive compaction in the STORED state
    (a late-arriving upsert older than a delete cannot resurrect the
    key), the live view filters them, and replays converge."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from magi_etl_spark.streaming.events_stream import (
        read_cdc_state,
        run_foreach_batch_cdc,
    )

    src = tmp_path / "cdc_src"
    src.mkdir()
    target = str(tmp_path / "cdc_target")
    ckpt = str(tmp_path / "cdc_ckpt")

    def write(path, rows):
        k, ts, seq, op, payload = zip(*rows)
        pq.write_table(
            pa.table(
                {
                    "k": pa.array(k, pa.int64()),
                    "ts": pa.array(ts, pa.int64()),
                    "seq": pa.array(seq, pa.int64()),
                    "op": pa.array(op, pa.string()),
                    "payload": pa.array(payload, pa.string()),
                }
            ),
            path,
        )

    def consume():
        stream = (
            spark.readStream.schema(
                "k long, ts long, seq long, op string, payload string"
            )
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src))
        )
        run_foreach_batch_cdc(
            stream, target, ckpt, keys=["k"], ts_col="ts", op_col="op",
            tiebreak_cols=["seq"],
        )

    # batch 1: k1 upserted twice (latest wins), k2 upserted then DELETED
    write(src / "00.parquet", [
        (1, 10, 1, "U", "a"),
        (1, 20, 2, "U", "b"),
        (2, 10, 3, "U", "x"),
        (2, 30, 4, "D", None),
    ])
    consume()
    live = {r.k: r.payload for r in read_cdc_state(spark, target).collect()}
    assert live == {1: "b"}
    stored = {r.k: r.op for r in spark.read.parquet(target).collect()}
    assert stored == {1: "U", 2: "D"}  # tombstone retained

    # batch 2: a LATE upsert for k2 older than its delete must lose;
    # a newer upsert for k1 wins; k3 appears
    write(src / "01.parquet", [
        (2, 20, 5, "U", "ghost"),   # ts 20 < delete ts 30 -> stays dead
        (1, 25, 6, "U", "c"),
        (3, 5, 7, "U", "n"),
    ])
    consume()
    live = {r.k: r.payload for r in read_cdc_state(spark, target).collect()}
    assert live == {1: "c", 3: "n"}

    # replay with no new input: checkpoint makes it a no-op
    consume()
    assert {
        r.k: r.payload for r in read_cdc_state(spark, target).collect()
    } == live
