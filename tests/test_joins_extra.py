"""Salted skew-join equivalence and blocked fuzzy record linkage."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _skewed(spark):
    # key 7 is hot (500 rows), the rest are singletons
    hot = spark.range(500).select(F.lit(7).alias("k"), F.col("id").alias("pay"))
    cold = spark.range(100).select(
        (F.col("id") + 100).alias("k"), (F.col("id") + 9000).alias("pay")
    )
    return hot.union(cold)


def _dims(spark):
    return spark.range(150).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("name")
    )


def test_salted_join_matches_plain_inner_and_left(spark):
    from magi_etl_spark.operators.joins import salted_join

    big, small = _skewed(spark), _dims(spark)
    for how in ("inner", "left"):
        plain = sorted(
            (r.k, r.pay, r.name)
            for r in big.join(small, ["k"], how).collect()
        )
        salted = sorted(
            (r.k, r.pay, r.name)
            for r in salted_join(big, small, ["k"], how, salt_buckets=8).collect()
        )
        assert salted == plain, how


def test_salted_join_rejects_replicating_sides(spark):
    from magi_etl_spark.operators.joins import salted_join

    with pytest.raises(ValueError):
        salted_join(_skewed(spark), _dims(spark), ["k"], how="full")


def test_fuzzy_join_blocked_linkage(spark):
    from magi_etl_spark.operators.joins import fuzzy_join, prefix_block

    crm = spark.createDataFrame(
        [(1, "Jonathan Smith"), (2, "Mary Jones"), (3, "Zed Zulu")],
        "crm_id long, crm_name string",
    )
    web = spark.createDataFrame(
        [
            (10, "jonathan smyth"),   # 1 edit after case-fold
            (11, "mary  jones"),      # extra space: 1 edit
            (12, "maria jones"),      # 2 edits
            (13, "bob briggs"),       # no match
            (14, "zed zulu"),         # exact after fold
        ],
        "web_id long, web_name string",
    )
    a = crm.withColumn("crm_fold", F.lower("crm_name"))
    b = web.withColumn("web_fold", F.lower("web_name"))
    out = fuzzy_join(
        a, b,
        prefix_block("crm_name"), prefix_block("web_name"),
        "crm_fold", "web_fold",
        max_distance=2,
    )
    got = {(r.crm_id, r.web_id): r.edit_distance for r in out.collect()}
    assert got == {(1, 10): 1, (2, 11): 1, (2, 12): 2, (3, 14): 0}
    # blocking means no cross-join: a candidate in a different block is
    # never even scored (bob briggs shares no block with any crm row)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
