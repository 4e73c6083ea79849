"""Join-size estimation and sketch-based distinct overlap: accuracy
against exact answers on the test tables, skew detection, determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_join_estimate_tracks_exact_join(spark, sf_dir):
    from magi_etl_spark.operators.cardinality import estimate_join_rows
    from magi_etl_spark.tables import load_table

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    exact = o.join(li, o["o_orderkey"] == li["l_orderkey"]).count()
    est = estimate_join_rows(
        o.withColumnRenamed("o_orderkey", "k"),
        li.withColumnRenamed("l_orderkey", "k"),
        ["k"],
        fraction=0.2,
    )
    # orderkey join: ~uniform fanout, key sampling at 20% should land
    # well within 2x either way on sf0.001
    assert exact / 2 <= est["estimated_rows"] <= exact * 2, (exact, est)
    assert est["sampled_keys"] > 0


def test_join_estimate_is_deterministic_and_flags_skew(spark):
    from magi_etl_spark.operators.cardinality import estimate_join_rows

    # one hot key (0) with 1000 x 1000 pairs, 99 cold keys with 1 pair
    big_a = spark.createDataFrame(
        [(0, i) for i in range(1000)] + [(k, 0) for k in range(1, 100)],
        "k long, x long",
    )
    big_b = spark.createDataFrame(
        [(0, i) for i in range(1000)] + [(k, 0) for k in range(1, 100)],
        "k long, y long",
    )
    e1 = estimate_join_rows(big_a, big_b, ["k"], fraction=0.5, seed="s")
    e2 = estimate_join_rows(big_a, big_b, ["k"], fraction=0.5, seed="s")
    assert e1 == e2  # pure hash draw
    # if the hot key was sampled, the skew alarm carries its pair count
    if e1["max_key_pairs"] >= 1000 * 1000:
        assert e1["estimated_rows"] >= 1000 * 1000
    else:
        # hot key missed: the estimate only covers cold keys
        assert e1["max_key_pairs"] == 1
    # a seed that samples the hot key demonstrates the alarm
    seen_hot = any(
        estimate_join_rows(big_a, big_b, ["k"], 0.5, seed=f"s{i}")[
            "max_key_pairs"
        ]
        >= 1000 * 1000
        for i in range(6)
    )
    assert seen_hot


def test_join_estimate_null_keys_excluded(spark):
    from magi_etl_spark.operators.cardinality import estimate_join_rows

    a = spark.createDataFrame([(None, 1)] * 50 + [(1, 1)], "k long, x long")
    b = spark.createDataFrame([(None, 2)] * 50 + [(1, 2)], "k long, y long")
    est = estimate_join_rows(a, b, ["k"], fraction=1.0)
    assert est["estimated_rows"] == 1.0  # NULLs never join


def test_join_estimate_validates_fraction(spark):
    from magi_etl_spark.operators.cardinality import estimate_join_rows

    with pytest.raises(ValueError):
        estimate_join_rows(None, None, ["k"], fraction=0.0)


def test_distinct_overlap_matches_exact_on_small_data(spark, sf_dir):
    from magi_etl_spark.operators.cardinality import distinct_overlap
    from magi_etl_spark.tables import load_table

    e = load_table(spark, sf_dir, "events")
    a = e.where(F.col("user_id") % 3 == 0)
    b = e.where(F.col("user_id") % 2 == 0)
    got = distinct_overlap(a, b, "user_id")
    na = a.select("user_id").distinct().count()
    nb = b.select("user_id").distinct().count()
    ninter = a.select("user_id").intersect(b.select("user_id")).count()
    # HLL at lg_k=14 is ~1% rsd; allow 5%
    assert got["distinct_a"] == pytest.approx(na, rel=0.05)
    assert got["distinct_b"] == pytest.approx(nb, rel=0.05)
    assert got["distinct_intersection"] == pytest.approx(ninter, rel=0.1, abs=5)


def test_distinct_overlap_disjoint_clamps_to_zero(spark):
    from magi_etl_spark.operators.cardinality import distinct_overlap

    a = spark.range(0, 1000).select(F.col("id").alias("k"))
    b = spark.range(5000, 6000).select(F.col("id").alias("k"))
    got = distinct_overlap(a, b, "k")
    assert got["distinct_intersection"] <= 20  # noise only, never negative
    assert got["distinct_intersection"] >= 0
