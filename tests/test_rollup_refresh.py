"""Incremental rollup refresh (operators/rollup_refresh.py): folding
daily increments must equal the full recompute."""

import pytest
from pyspark.sql import functions as F

from magi_etl_spark.operators.rollup_refresh import (
    MetricCol,
    aggregate_increment,
    refresh,
)

METRICS = [
    MetricCol("n", "count"),
    MetricCol("value_c", "sum"),
    MetricCol("min_v", "min"),
    MetricCol("max_v", "max"),
]


def _exprs():
    return {
        "n": F.lit(1),
        "value_c": F.round(F.col("value") * 100).cast("long"),
        "min_v": F.round(F.col("value") * 100).cast("long"),
        "max_v": F.round(F.col("value") * 100).cast("long"),
    }


def test_incremental_equals_full(spark, sf_dir):
    from magi_etl_spark.tables import load_table

    e = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    # split the fact table into three "days" and fold them in one by one
    days = [e.where(F.col("event_id") % 3 == k) for k in range(3)]
    rollup = None
    for day in days:
        inc = aggregate_increment(day, ["event_type"], METRICS, _exprs())
        rollup = refresh(rollup, inc, ["event_type"], METRICS)
    full = aggregate_increment(e, ["event_type"], METRICS, _exprs())
    got = {r.event_type: r for r in rollup.collect()}
    want = {r.event_type: r for r in full.collect()}
    assert set(got) == set(want)
    for k in want:
        for m in ("n", "value_c", "min_v", "max_v"):
            assert got[k][m] == want[k][m], (k, m)


def test_new_and_missing_groups_pass_through(spark):
    prior = spark.createDataFrame(
        [("a", 2, 10), ("b", 1, 5)], "g string, n long, value_c long"
    )
    inc = spark.createDataFrame(
        [("b", 3, 7), ("c", 1, 1)], "g string, n long, value_c long"
    )
    m = [MetricCol("n", "count"), MetricCol("value_c", "sum")]
    got = {r.g: r for r in refresh(prior, inc, ["g"], m).collect()}
    assert got["a"].n == 2 and got["a"].value_c == 10  # untouched history
    assert got["b"].n == 4 and got["b"].value_c == 12  # merged
    assert got["c"].n == 1 and got["c"].value_c == 1  # new group


def test_distinct_refused():
    with pytest.raises(ValueError, match="not a mergeable"):
        MetricCol("users", "count_distinct")


def test_hll_distinct_incremental_equals_full(spark, sf_dir):
    from magi_etl_spark.operators.rollup_refresh import estimate_distinct
    from magi_etl_spark.tables import load_table

    e = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type"
    )
    m = [MetricCol("n", "count"), MetricCol("users", "approx_distinct")]
    ex = {"n": F.lit(1), "users": F.col("user_id")}
    rollup = None
    for k in range(3):
        day = e.where(F.col("event_id") % 3 == k)
        rollup = refresh(
            rollup, aggregate_increment(day, ["event_type"], m, ex),
            ["event_type"], m,
        )
    got = {
        r.event_type: r.users
        for r in estimate_distinct(rollup, ["users"]).collect()
    }
    full = {
        r.event_type: r.users
        for r in estimate_distinct(
            aggregate_increment(e, ["event_type"], m, ex), ["users"]
        ).collect()
    }
    # sketch-of-union == union-of-sketches: estimates are IDENTICAL
    assert got == full
    # and at this cardinality (150 users) the HLL estimate is exact
    exact = {
        r.event_type: r.u
        for r in e.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("u"))
        .collect()
    }
    assert got == exact
