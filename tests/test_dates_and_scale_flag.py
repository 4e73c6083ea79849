from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from magi_etl_spark.config import MetricQueryConfig
from magi_etl_spark.functions.dates import (
    convert_tz,
    date_intervals,
    first_day_of_iso_week,
    linear_bins,
    reassemble_date,
    seconds_between,
)
from magi_etl_spark.metrics import APPROX_DISTINCT_CONF
from magi_etl_spark.query import metric_query


def test_date_helpers(spark):
    df = spark.createDataFrame(
        [("2025", "02", "27", None)], "y string, m string, d string, nil string"
    )
    row = df.select(
        reassemble_date(F.col("y"), F.col("m"), F.col("d")).alias("dt"),
        reassemble_date(F.col("y"), F.col("m"), F.col("nil")).alias("dt_null"),
        date_intervals(F.lit("2025-01-01"), F.lit("2025-01-08"), "7 days").alias("seq"),
        # Render engine-side: collecting a naive datetime would leak the driver
        # OS timezone through PySpark's timestamp conversion (TZ-dependent).
        F.date_format(
            convert_tz(F.lit("2025-06-01 12:00:00").cast("timestamp"), "UTC", "America/New_York"),
            "yyyy-MM-dd HH:mm:ss",
        ).alias("nyc"),
        first_day_of_iso_week(F.lit(2025), F.lit(9)).alias("wk"),
        seconds_between(
            F.lit("2025-01-01 00:00:01").cast("timestamp"),
            F.lit("2025-01-01 00:10:00").cast("timestamp"),
        ).alias("secs"),
    ).collect()[0]
    assert row.dt == dt.date(2025, 2, 27)
    assert row.dt_null is None  # NULL part -> NULL date (Presto parity)
    assert row.seq == [dt.date(2025, 1, 1), dt.date(2025, 1, 8)]
    assert row.nyc == "2025-06-01 08:00:00"  # EDT = UTC-4
    assert row.wk == dt.date(2025, 2, 24)  # ISO 2025-W09 Monday
    assert row.secs == 599


def test_linear_bins(spark):
    df = spark.range(0, 101).select(F.col("id").cast("double").alias("v"))
    out = df.select(
        linear_bins(F.col("v"), F.lit(0.0), F.lit(100.0), 4).alias("b"), "v"
    ).collect()
    got = {int(r.v): r.b for r in out}
    assert got[0] == 0 and got[24] == 0 and got[25] == 1 and got[99] == 3
    assert got[100] == 3  # max clamps into last bin
    deg = spark.range(1).select(linear_bins(F.lit(5.0), F.lit(5.0), F.lit(5.0), 4).alias("b"))
    assert deg.collect()[0].b == 0


def test_approx_distinct_flag(spark, sf_dir):
    cfg = MetricQueryConfig(dataset="events", dimensions=["event_type"], metrics=["users"])
    exact = {r.event_type: r.users for r in metric_query(spark, sf_dir, cfg).collect()}
    spark.conf.set(APPROX_DISTINCT_CONF, "true")
    try:
        approx = {r.event_type: r.users for r in metric_query(spark, sf_dir, cfg).collect()}
    finally:
        spark.conf.set(APPROX_DISTINCT_CONF, "false")
    assert set(exact) == set(approx)
    for k in exact:  # HLL within 10% of exact at this cardinality
        assert abs(approx[k] - exact[k]) <= max(2, 0.1 * exact[k])
