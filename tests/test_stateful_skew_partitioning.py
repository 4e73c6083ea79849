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


def _viral_fixture(spark, tmp_path):
    """100:1 skewed traffic: one viral wiki dominates page_traffic; the
    per-wiki daily table is small (the trending J3 join shape)."""
    from pyspark.sql import functions as F

    viral = spark.range(20_000).select(
        F.lit("viral_wiki").alias("wiki_name"),
        F.concat(F.lit("/p"), (F.col("id") % 500).cast("string")).alias("page"),
        (F.col("id") % 97).alias("users"),
    )
    cold = spark.range(40_000).select(
        F.concat(F.lit("w"), (F.col("id") % 200).cast("string")).alias("wiki_name"),
        F.concat(F.lit("/p"), (F.col("id") % 50).cast("string")).alias("page"),
        (F.col("id") % 11).alias("users"),
    )
    traffic_path = str(tmp_path / "traffic")
    viral.unionByName(cold).write.parquet(traffic_path)
    daily = spark.createDataFrame(
        [("viral_wiki", 9000)] + [(f"w{i}", 40 + i) for i in range(200)],
        "wiki_name string, daily_users long",
    )
    return spark.read.parquet(traffic_path), daily


def test_viral_wiki_aqe_skew_join_split(spark, tmp_path):
    """AQE detects the viral-wiki partition at shuffle time and splits it
    (`skew=true` in the final SMJ) — the runtime path the session factory
    enables for trending's hot-key joins."""
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.coalescePartitions.enabled",
        )
    }
    try:
        # forbid broadcast so the join shuffles; lower the skew thresholds
        # to fixture scale (defaults target 256MB partitions)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
        traffic, daily = _viral_fixture(spark, tmp_path)
        joined = traffic.join(daily, "wiki_name")
        # collect() finalizes THIS DataFrame's AdaptiveSparkPlan (count()
        # would execute a different QueryExecution and leave this one
        # unplanned)
        assert len(joined.collect()) == 60_000
        final_plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in final_plan, final_plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_viral_wiki_salted_join_exact(spark, tmp_path):
    """The explicit salted join spreads the known-hot wiki across salt
    buckets and returns exactly the plain join's rows."""
    from magi_etl_spark.operators.skew import salted_join

    traffic, daily = _viral_fixture(spark, tmp_path)
    plain = traffic.join(daily, "wiki_name")
    salted = salted_join(traffic, daily, ["wiki_name"], salt_buckets=8)
    assert salted.count() == plain.count() == 60_000
    key = lambda r: (r["wiki_name"], r["page"], r["users"], r["daily_users"])  # noqa: E731
    assert sorted(map(key, salted.collect())) == sorted(map(key, plain.collect()))
    # left join with an unmatched hot row keeps NULLs intact
    some_missing = daily.where(F.col("wiki_name") != "viral_wiki")
    left = salted_join(traffic, some_missing, ["wiki_name"], how="left")
    assert left.where(F.col("daily_users").isNull()).count() == 20_000


def test_key_skew_profile_flags_hot_key(spark, tmp_path):
    import pytest

    from magi_etl_spark.operators.skew import key_skew_profile

    traffic, _ = _viral_fixture(spark, tmp_path)
    prof = key_skew_profile(traffic, ["wiki_name"], top_k=5).collect()
    top = prof[0]
    assert top.wiki_name == "viral_wiki" and top.rank == 1
    assert top.n == 20_000
    assert top.share == pytest.approx(20_000 / 60_000, abs=1e-6)
    # viral wiki is ~67x the mean key size -> clear salting signal
    assert top.x_mean > 50
    assert len(prof) == 5 and [r.rank for r in prof] == [1, 2, 3, 4, 5]
