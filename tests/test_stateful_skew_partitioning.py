"""Tests for the stateful streaming operator, salted distinct counts, and
partition-pruned writes."""

from __future__ import annotations

import io
import shutil
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from magi_etl_spark.operators.skew import salted_count_distinct


def test_applyinpandaswithstate_running_stats(spark, sf_dir, tmp_path):
    from magi_etl_spark.streaming.events_stream import stream_events
    from magi_etl_spark.streaming.stateful import running_user_stats

    src_dir = tmp_path / "ev"
    src_dir.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", src_dir / "part-0.parquet")
    stream = stream_events(spark, str(src_dir))
    q = (
        running_user_stats(stream)
        .writeStream.format("memory")
        .queryName("user_stats")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r.user_id: (r.total_events, round(r.total_value, 6))
        for r in spark.sql("select * from user_stats").collect()
    }
    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    expected = {
        r.user_id: (r.n, round(r.v, 6))
        for r in batch.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("v"))
        .collect()
    }
    assert got == expected


def test_salted_count_distinct_exact(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    salted = salted_count_distinct(e, ["event_type"], "user_id", "users", 16)
    plain = e.groupBy("event_type").agg(F.countDistinct("user_id").alias("users"))
    assert {tuple(r) for r in salted.collect()} == {tuple(r) for r in plain.collect()}


def test_partitioned_write_prunes(spark, sf_dir, tmp_path):
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    path = str(tmp_path / "events_by_type")
    e.write.mode("overwrite").partitionBy("event_type").parquet(path)
    back = spark.read.parquet(path).where(F.col("event_type") == "purchase")
    buf = io.StringIO()
    with redirect_stdout(buf):
        back.explain("formatted")
    plan = buf.getvalue()
    # the predicate becomes a partition filter: non-matching dirs never read
    assert "PartitionFilters: [isnotnull(event_type" in plan
    assert back.count() == e.where(F.col("event_type") == "purchase").count()
