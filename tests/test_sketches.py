"""Sketch-operator invariants the oracles can't express: CMS one-sided
error corpus-wide, KMV exactness below k, HLL accuracy band, containment
asymmetry, curriculum order properties."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_kmv_exact_below_k(spark):
    from magi_etl_spark.operators.sketches import kmv_distinct

    df = spark.createDataFrame(
        [("g", i % 10) for i in range(100)], "g string, v int"
    )
    out = kmv_distinct(df, ["g"], "v", k=64).collect()
    assert len(out) == 1
    assert out[0]["n_seen"] == 10 and out[0]["est_distinct"] == 10.0


def test_kmv_estimate_within_band(spark):
    from magi_etl_spark.operators.sketches import kmv_distinct

    n = 5000
    df = spark.createDataFrame([("g", i) for i in range(n)], "g string, v int")
    est = kmv_distinct(df, ["g"], "v", k=256).collect()[0]["est_distinct"]
    # KMV std error ~ 1/sqrt(k-2) ≈ 6.3%; allow 4 sigma
    assert abs(est - n) / n < 0.25, est


def test_hll_estimate_within_band(spark):
    from magi_etl_spark.operators.sketches import hll_distinct

    n = 5000
    df = spark.createDataFrame([("g", i) for i in range(n)], "g string, v int")
    est = hll_distinct(df, ["g"], "v").collect()[0]["est_distinct"]
    # HLL std error ~ 1.04/sqrt(64) = 13%; allow ~3.5 sigma
    assert abs(est - n) / n < 0.45, est


def test_hll_small_range_is_near_exact(spark):
    from magi_etl_spark.operators.sketches import hll_distinct

    df = spark.createDataFrame([("g", i % 7) for i in range(50)], "g string, v int")
    est = hll_distinct(df, ["g"], "v").collect()[0]["est_distinct"]
    # linear counting at tiny cardinalities is tight
    assert abs(est - 7) <= 2, est


def test_hll_is_partitioning_invariant(spark):
    """The determinism claim: the harmonic sum adds exact powers of two,
    so the estimate cannot depend on aggregation order."""
    from magi_etl_spark.operators.sketches import hll_distinct

    df = spark.createDataFrame([("g", i) for i in range(1000)], "g string, v int")
    a = hll_distinct(df.repartition(1), ["g"], "v").collect()[0]["est_distinct"]
    b = hll_distinct(df.repartition(32), ["g"], "v").collect()[0]["est_distinct"]
    assert a == b


def test_cms_never_undercounts(spark, sf_dir):
    from magi_etl_spark.operators.sketches import cms_counts
    from magi_etl_spark.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    tc = (
        d.select(
            F.explode(
                F.regexp_extract_all(F.lower("text"), F.lit("[a-z]+"), 0)
            ).alias("token")
        )
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    out = cms_counts(tc, "token", "freq", depth=4, width=256)
    under = out.where(F.col("est_freq") < F.col("freq")).count()
    assert under == 0
    # and the estimates are not degenerate: the top token is exact or
    # close (heavy hitters dominate their buckets)
    top = out.orderBy(F.desc("freq")).first()
    assert top["est_freq"] >= top["freq"]


def test_containment_is_asymmetric_and_catches_subsets(spark):
    from magi_etl_spark.operators.dedup import containment_pairs

    short = "alpha beta gamma delta epsilon"
    longdoc = short + " zeta eta theta iota kappa lambda mu nu xi omicron pi"
    df = spark.createDataFrame(
        [(1, short), (2, longdoc), (3, "totally unrelated words only here")],
        "doc_id long, text string",
    )
    rows = {
        (r["doc_a"], r["doc_b"]): r["containment"]
        for r in containment_pairs(df, "doc_id", "text", n=3, threshold=0.5).collect()
    }
    assert rows[(1, 2)] == 1.0  # the short doc is fully contained
    assert (2, 1) not in rows  # the long doc is NOT contained in the short
    assert not any(3 in p for p in rows)


def test_curriculum_order_properties(spark):
    from magi_etl_spark.operators.mixing import curriculum_order

    df = spark.createDataFrame(
        [(i, i * 100) for i in range(200)], "doc_id long, n_chars int"
    )
    out = curriculum_order(
        df, F.least(F.floor(F.col("n_chars") / 500), F.lit(9)), "doc_id"
    ).collect()
    assert sorted(r["curriculum_pos"] for r in out) == list(range(1, 201))
    by_pos = sorted(out, key=lambda r: r["curriculum_pos"])
    stages = [r["stage"] for r in by_pos]
    assert stages == sorted(stages)  # easy -> hard, never interleaved
    # within a stage the order is the hash shuffle, not doc_id order
    s0 = [r["doc_id"] for r in by_pos if r["stage"] == 0]
    assert len(s0) >= 4 and s0 != sorted(s0)
