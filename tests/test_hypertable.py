"""Hypertable rollup (operators/hypertable.py)."""

import pytest
from pyspark.sql import functions as F

from magi_etl_spark.operators.hypertable import hypertable_rollup, time_bucket
from magi_etl_spark.operators.rollup_refresh import MetricCol

METRICS = [MetricCol("n", "count"), MetricCol("v", "sum")]


def EXPRS():
    return {"n": F.lit(1), "v": F.col("x")}


def test_cascade_equals_direct(spark):
    hour = 3_600_000_000
    rows = [
        ("a", i * hour // 4, float(i)) for i in range(100)  # 15-min spacing
    ] + [("b", i * hour, 1.0) for i in range(30)]
    df = spark.createDataFrame(rows, "g string, us long, x double")
    out = hypertable_rollup(df, "us", ["g"], METRICS, EXPRS(),
                            resolutions=[3600, 86400])
    # day level must equal grouping the raw rows by day directly
    direct = (
        df.withColumn("bucket_us", time_bucket(F.col("us"), 86400))
        .groupBy("bucket_us", "g")
        .agg(F.count("*").alias("n"), F.sum("x").alias("v"))
    )
    got = {
        (r.bucket_us, r.g): (r.n, r.v)
        for r in out.where(F.col("resolution_sec") == 86400).collect()
    }
    want = {(r.bucket_us, r.g): (r.n, r.v) for r in direct.collect()}
    assert got == want
    # totals conserved at every resolution
    per_res = {
        r.resolution_sec: (r.total_n, r.total_v)
        for r in out.groupBy("resolution_sec")
        .agg(F.sum("n").alias("total_n"), F.sum("v").alias("total_v"))
        .collect()
    }
    assert per_res[3600] == per_res[86400] == (130, sum(float(i) for i in range(100)) + 30)


def test_non_nesting_resolutions_rejected(spark):
    df = spark.createDataFrame([("a", 0, 1.0)], "g string, us long, x double")
    with pytest.raises(ValueError, match="nest"):
        hypertable_rollup(df, "us", ["g"], METRICS, EXPRS(),
                          resolutions=[3600, 5000])


def test_shared_cascade_exchange_reused(spark):
    df = spark.createDataFrame(
        [("a", i * 1_000_000, 1.0) for i in range(1000)],
        "g string, us long, x double",
    )
    out = hypertable_rollup(df, "us", ["g"], METRICS, EXPRS())
    out.collect()  # finalize the adaptive plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the union branches share the finest-level aggregation subtree:
    # Spark must REUSE that exchange, i.e. the fact scan+agg runs once,
    # not once per resolution
    assert "ReusedExchange" in plan
