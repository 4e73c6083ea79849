"""Invariants the q139-q146 oracles can't express: funnel monotonicity
and window semantics, retention bounds, Markov row-stochasticity, RFM
score bounds, PSI non-negativity / zero-on-identical, MAD shift
invariance and known-outlier detection, co-purchase lift on a hand
fixture, and JL projection linearity / distance preservation."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def _ts(day: int, hour: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, day, hour)


def _events(spark, rows):
    return spark.createDataFrame(
        [(i, *r) for i, r in enumerate(rows)],
        "event_id long, user_id long, ts timestamp, event_type string",
    )


def test_funnel_counts_are_monotone_and_windowed(spark):
    from magi_etl_spark.operators.behavior import funnel_stages

    rows = [
        # user 1 completes in-window
        (1, _ts(1, 0), "view"),
        (1, _ts(1, 1), "click"),
        (1, _ts(1, 2), "purchase"),
        # user 2 clicks too late (gap > 2h)
        (2, _ts(1, 0), "view"),
        (2, _ts(1, 5), "click"),
        # user 3 purchases BEFORE clicking — must not count at stage 3
        (3, _ts(1, 0), "view"),
        (3, _ts(1, 1), "purchase"),
        (3, _ts(1, 2), "click"),
    ]
    out = {
        r["stage"]: r
        for r in funnel_stages(
            _events(spark, rows), ["view", "click", "purchase"], max_gap_s=7200
        ).collect()
    }
    assert out["view"]["n_users"] == 3
    assert out["click"]["n_users"] == 2  # users 1, 3
    assert out["purchase"]["n_users"] == 1  # only user 1
    assert out["view"]["conv_from_prev"] == 1.0
    counts = [out[s]["n_users"] for s in ("view", "click", "purchase")]
    assert counts == sorted(counts, reverse=True)


def test_funnel_unbounded_window_is_superset(spark):
    from magi_etl_spark.operators.behavior import funnel_stages

    rows = [(1, _ts(1), "view"), (1, _ts(20), "click")]
    bounded = funnel_stages(
        _events(spark, rows), ["view", "click"], max_gap_s=3600
    ).collect()
    unbounded = funnel_stages(_events(spark, rows), ["view", "click"]).collect()
    by_stage = lambda rs: {r["stage"]: r["n_users"] for r in rs}  # noqa: E731
    assert by_stage(bounded)["click"] == 0
    assert by_stage(unbounded)["click"] == 1


def test_cohort_retention_bounds(spark):
    from magi_etl_spark.operators.behavior import cohort_retention

    rows = [
        (1, _ts(1), "view"),   # cohort week of Jan 1
        (1, _ts(9), "view"),   # active at offset 1
        (2, _ts(2), "view"),   # same cohort, never returns
    ]
    out = cohort_retention(_events(spark, rows), max_offset=4).collect()
    at0 = [r for r in out if r["week_offset"] == 0]
    assert len(at0) == 1 and at0[0]["retention"] == 1.0 and at0[0]["n_users"] == 2
    at1 = [r for r in out if r["week_offset"] == 1]
    assert len(at1) == 1 and at1[0]["n_users"] == 1 and at1[0]["retention"] == 0.5
    assert all(0.0 <= r["retention"] <= 1.0 for r in out)


def test_markov_rows_are_stochastic(spark):
    from magi_etl_spark.operators.behavior import markov_transitions

    rows = [
        (1, _ts(1, 0), "a"),
        (1, _ts(1, 1), "b"),
        (1, _ts(1, 2), "a"),
        (2, _ts(1, 0), "a"),
        (2, _ts(1, 1), "a"),
    ]
    out = markov_transitions(_events(spark, rows)).collect()
    # transitions: u1 a->b, b->a; u2 a->a  => from 'a': {b:1, a:1}
    total = sum(r["n_trans"] for r in out)
    assert total == 3  # (rows - users)
    from collections import defaultdict

    per_src = defaultdict(float)
    for r in out:
        per_src[r["src_type"]] += r["prob"]
    for src, p in per_src.items():
        assert abs(p - 1.0) < 1e-6, (src, p)


def test_rfm_scores_bounded_and_partition_customers(spark):
    from magi_etl_spark.operators.behavior import rfm_segments

    rows = [
        (i, 1 + (i % 20), "O", 100.0 * (1 + i % 7), _ts(1 + i % 25))
        for i in range(200)
    ]
    orders = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp",
    )
    out = rfm_segments(orders).collect()
    assert sum(r["n_customers"] for r in out) == 20
    for r in out:
        for c in ("r_score", "f_score", "m_score"):
            assert 1 <= r[c] <= 4


def test_psi_zero_on_identical_and_nonnegative(spark):
    from magi_etl_spark.operators.drift import psi_drift

    # identical value distributions before/after the split => PSI == 0
    rows = []
    i = 0
    for day in (1, 20):  # one baseline day, one current day
        for v in (5.0, 50.0, 150.0, 340.0) * 25:
            rows.append((i, 1, _ts(day), "t", v))
            i += 1
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, "
        "event_type string, value double"
    )
    out = psi_drift(df, split_ts="2024-01-10").collect()
    assert len(out) == 1
    assert out[0]["psi"] == 0.0
    assert out[0]["n_base"] == out[0]["n_cur"] == 100

    # every PSI term (p-q)ln(p/q) >= 0, so PSI >= 0 on any input
    rows2 = [
        (i, 1, _ts(1 if i % 3 else 20), "t", float(i % 347)) for i in range(300)
    ]
    df2 = spark.createDataFrame(
        rows2, "event_id long, user_id long, ts timestamp, "
        "event_type string, value double"
    )
    assert all(r["psi"] >= 0.0 for r in psi_drift(df2, "2024-01-10").collect())


def test_mad_outliers_shift_invariant_and_detects(spark):
    from magi_etl_spark.operators.drift import mad_outliers

    base = [float(100 + (i % 11)) for i in range(50)] + [1000.0]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(base)], "k long, v double"
    )
    out = {r["k"]: r for r in mad_outliers(df, ["k"], "v").collect()}
    assert out[50]["is_outlier"]  # the planted spike
    assert sum(1 for r in out.values() if r["is_outlier"]) == 1

    shifted = spark.createDataFrame(
        [(i, v + 5000.0) for i, v in enumerate(base)], "k long, v double"
    )
    out2 = {r["k"]: r for r in mad_outliers(shifted, ["k"], "v").collect()}
    for k in out:
        assert out[k]["is_outlier"] == out2[k]["is_outlier"]
        assert abs(out[k]["robust_z"] - out2[k]["robust_z"]) < 1e-6


def test_mad_zero_mad_yields_no_flags(spark):
    from magi_etl_spark.operators.drift import mad_outliers

    df = spark.createDataFrame(
        [(i, 7.0) for i in range(9)] + [(9, 8.0)], "k long, v double"
    )
    out = mad_outliers(df, ["k"], "v").collect()
    assert all(not r["is_outlier"] for r in out)
    assert all(r["robust_z"] == 0.0 for r in out)


def test_copurchase_lift_hand_fixture(spark):
    from magi_etl_spark.operators.association import copurchase_pairs

    # baskets: {1,2} x3, {1,3} x1, {2,3} x1 => 5 baskets
    rows = []
    bk = 0
    for items, n in (((1, 2), 3), ((1, 3), 1), ((2, 3), 1)):
        for _ in range(n):
            for it in items:
                rows.append((bk, it))
            bk += 1
    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    out = {
        (r["item_a"], r["item_b"]): r
        for r in copurchase_pairs(df, min_co=1).collect()
    }
    r12 = out[(1, 2)]
    # lift = N * n_co / (n_a * n_b) = 5*3 / (4*4)
    assert r12["n_co"] == 3 and r12["n_a"] == 4 and r12["n_b"] == 4
    assert abs(r12["lift"] - round(5 * 3 / 16, 4)) < 1e-9
    assert (1, 3) in out and out[(1, 3)]["n_co"] == 1
    # min_co filters
    assert set(copurchase_pairs(df, min_co=2).select("item_a", "item_b")
               .toPandas().itertuples(index=False, name=None)) == {(1, 2)}


def test_copurchase_max_basket_drops_whale_baskets(spark):
    from magi_etl_spark.operators.association import copurchase_pairs

    rows = [(1, i) for i in range(20)] + [(2, 1), (2, 2), (3, 1), (3, 2)]
    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    out = copurchase_pairs(df, min_co=1, max_basket=5).collect()
    # basket 1 (20 items) dropped whole; only the pair from baskets 2,3
    assert len(out) == 1 and out[0]["n_co"] == 2


def test_random_projection_linearity_and_determinism(spark):
    from magi_etl_spark.operators.projection import random_projection

    v = [float((i * 7) % 13 - 6) for i in range(16)]
    df = spark.createDataFrame(
        [(1, v), (2, [2 * x for x in v])], "vec_id long, embedding array<double>"
    )
    out = {
        r["vec_id"]: [r[f"p{j}"] for j in range(4)]
        for r in random_projection(
            df, out_dim=4, scale=False, decimals=6
        ).collect()
    }
    for a, b in zip(out[1], out[2]):
        assert abs(2 * a - b) < 1e-4  # projection is linear
    again = {
        r["vec_id"]: [r[f"p{j}"] for j in range(4)]
        for r in random_projection(
            df, out_dim=4, scale=False, decimals=6
        ).collect()
    }
    assert out == again


def test_random_projection_preserves_norms_on_average(spark):
    import math
    import random

    from magi_etl_spark.operators.projection import random_projection

    rng = random.Random(7)
    vecs = [
        (i, [rng.gauss(0, 1) for _ in range(32)]) for i in range(64)
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    rows = random_projection(df, out_dim=16, decimals=6).collect()
    ratios = []
    for (i, v), r in zip(vecs, sorted(rows, key=lambda r: r["vec_id"])):
        pn = math.sqrt(sum(r[f"p{j}"] ** 2 for j in range(16)))
        vn = math.sqrt(sum(x * x for x in v))
        ratios.append(pn / vn)
    mean = sum(ratios) / len(ratios)
    # E[||p||^2] = ||v||^2 under the JL normalization; concentration at
    # out_dim=16 keeps the mean ratio near 1
    assert 0.8 < mean < 1.2, mean


def test_triangle_count_hand_fixture(spark):
    from magi_etl_spark.operators.graph import triangle_count

    # K4 on {1,2,3,4} plus a pendant 5-1: 4 triangles, each K4 node in 3
    edges = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)] + [(5, 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = {r["node"]: r for r in triangle_count(df).collect()}
    assert set(out) == {1, 2, 3, 4}  # node 5 is in no triangle
    for n in (2, 3, 4):
        assert out[n]["n_triangles"] == 3 and out[n]["clustering"] == 1.0
    assert out[1]["degree"] == 4 and out[1]["n_triangles"] == 3
    assert out[1]["clustering"] == 0.5  # 2*3/(4*3)


def test_triangle_count_orientation_invariance(spark):
    from magi_etl_spark.operators.graph import triangle_count

    fwd = [(1, 2), (2, 3), (3, 1)]
    rev = [(2, 1), (3, 2), (1, 3), (1, 2)]  # reversed + a duplicate
    a = sorted(map(tuple, triangle_count(
        spark.createDataFrame(fwd, "src long, dst long")).collect()))
    b = sorted(map(tuple, triangle_count(
        spark.createDataFrame(rev, "src long, dst long")).collect()))
    assert a == b
    assert len(a) == 3 and all(r[2] == 1 for r in a)


def test_attribution_last_touch_and_lookback(spark):
    from magi_etl_spark.operators.behavior import last_touch_attribution

    rows = [
        # u1: view then click then purchase -> credited to click
        (1, _ts(1, 0), "view", 0.0),
        (1, _ts(1, 1), "click", 0.0),
        (1, _ts(1, 2), "purchase", 10.0),
        # u2: touch 10 days before purchase -> out of 7d lookback
        (2, _ts(1, 0), "view", 0.0),
        (2, _ts(11, 0), "purchase", 20.0),
        # u3: purchase with no touch at all
        (3, _ts(1, 0), "purchase", 40.0),
    ]
    df = spark.createDataFrame(
        [(i, *r) for i, r in enumerate(rows)],
        "event_id long, user_id long, ts timestamp, event_type string, "
        "value double",
    )
    out = {
        r["channel"]: r
        for r in last_touch_attribution(
            df, ["view", "click"], "purchase", lookback_s=7 * 86400
        ).collect()
    }
    assert out["click"]["n_conversions"] == 1
    assert out["click"]["attributed_value"] == 10.0
    assert out["(none)"]["n_conversions"] == 2
    assert out["(none)"]["attributed_value"] == 60.0
    assert "view" not in out


def test_kmv_set_overlap_exact_below_k(spark):
    from magi_etl_spark.operators.sketches import kmv_set_overlap

    # A = {0..29}, B = {20..49}: |A|=30 |B|=30 |A∪B|=50 |A∩B|=10
    rows = [("a", v) for v in range(30)] + [("b", v) for v in range(20, 50)]
    df = spark.createDataFrame(rows, "g string, v int")
    out = kmv_set_overlap(df, "g", "v", "a", "b", k=64).collect()[0]
    assert out["est_a"] == 30.0 and out["est_b"] == 30.0
    assert out["est_union"] == 50.0
    assert out["est_intersection"] == 10.0
    assert out["jaccard"] == round(10 / 50, 4)


def test_kmv_set_overlap_estimate_band(spark):
    from magi_etl_spark.operators.sketches import kmv_set_overlap

    # overlapping ranges well above k: estimates within a loose band
    rows = [("a", v) for v in range(3000)] + [
        ("b", v) for v in range(1500, 4500)
    ]
    df = spark.createDataFrame(rows, "g string, v int")
    out = kmv_set_overlap(df, "g", "v", "a", "b", k=256).collect()[0]
    assert abs(out["est_union"] - 4500) / 4500 < 0.3
    assert abs(out["jaccard"] - 1500 / 4500) < 0.15


def test_kmv_set_overlap_empty_sets(spark):
    from magi_etl_spark.operators.sketches import kmv_set_overlap

    df = spark.createDataFrame([("c", 1)], "g string, v int")
    out = kmv_set_overlap(df, "g", "v", "a", "b", k=64).collect()[0]
    assert out["est_union"] == 0.0 and out["jaccard"] == 0.0
    assert out["est_intersection"] == 0.0


def test_average_hash_invariants(spark):
    from magi_etl_spark.operators.multimodal import (
        average_hash,
        synthesize_test_images,
    )

    ids = spark.createDataFrame([(i,) for i in range(40)], "doc_id long")
    imgs = synthesize_test_images(ids)
    out = {r["media_id"]: r["phash"] for r in average_hash(imgs).collect()}
    assert set(out) == set(range(40))
    for h in out.values():
        assert 0 <= h < (1 << 16)
    # the pixel law repeats only when BOTH the geometry (lcm(5,4)=20)
    # and the intensity ramp (id*31 mod 256) align — ids 20 apart share
    # geometry but shift intensity, so hashes may differ; identical ids
    # always hash identically (re-run determinism)
    again = {r["media_id"]: r["phash"] for r in average_hash(imgs).collect()}
    assert out == again


def test_phash_near_dup_matches_brute_force(spark):
    import random

    from pyspark.sql import functions as F

    from magi_etl_spark.operators.multimodal import phash_near_dup_pairs

    rng = random.Random(13)
    base = rng.randrange(1 << 16)
    hashes = [(0, base)]
    for i in range(1, 60):
        h = rng.randrange(1 << 16) if i % 3 else base ^ (1 << (i % 16))
        hashes.append((i, h))
    df = spark.createDataFrame(hashes, "media_id long, phash long")
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in phash_near_dup_pairs(df, max_dist=2, bits=16).collect()
    }
    want = set()
    for i, hi in hashes:
        for j, hj in hashes:
            if i < j and bin(hi ^ hj).count("1") <= 2:
                want.add((i, j, bin(hi ^ hj).count("1")))
    assert got == want and want  # banding loses nothing, non-trivial set


def test_phash_banding_guards(spark):
    import pytest as _pytest

    from magi_etl_spark.operators.multimodal import phash_near_dup_pairs

    df = spark.createDataFrame([(1, 5)], "media_id long, phash long")
    with _pytest.raises(ValueError, match="divide"):
        phash_near_dup_pairs(df, max_dist=2, n_bands=3, bits=16)
    with _pytest.raises(ValueError, match="pigeonhole"):
        phash_near_dup_pairs(df, max_dist=4, n_bands=4, bits=16)


def test_ols_recovers_exact_line(spark):
    from magi_etl_spark.operators.stats import group_ols_trend

    rows = [("g", float(x), 3.0 * x + 7.0) for x in range(20)]
    rows += [("flat", float(x), 5.0) for x in range(10)]
    rows += [("tiny", 1.0, 2.0)]  # n < 2
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = {r["g"]: r for r in group_ols_trend(df, ["g"], "x", "y").collect()}
    assert out["g"]["slope"] == 3.0 and out["g"]["intercept"] == 7.0
    assert out["g"]["r2"] == 1.0
    assert out["flat"]["slope"] == 0.0 and out["flat"]["r2"] is None
    assert out["tiny"]["slope"] is None


def test_wilson_interval_bounds_and_coverage(spark):
    from pyspark.sql import functions as F

    from magi_etl_spark.operators.stats import wilson_interval

    rows = [("g", i < 30) for i in range(100)] + [("few", i < 1) for i in range(3)]
    df = spark.createDataFrame(rows, "g string, s boolean")
    out = {r["g"]: r for r in wilson_interval(df, ["g"], F.col("s")).collect()}
    g = out["g"]
    assert g["rate"] == 0.3
    assert 0.0 <= g["ci_lo"] < 0.3 < g["ci_hi"] <= 1.0
    # Wilson stays in [0,1] even at tiny n / extreme p
    f = out["few"]
    assert 0.0 <= f["ci_lo"] <= f["ci_hi"] <= 1.0


def test_ab_assignment_is_deterministic_and_balanced(spark):
    from pyspark.sql import functions as F

    from magi_etl_spark.operators.stats import ab_assign_and_compare

    df = spark.createDataFrame(
        [(i, i % 5 == 0) for i in range(2000)], "user_id long, conv boolean"
    )
    out = {r["variant"]: r for r in ab_assign_and_compare(
        df, "user_id", F.col("conv")).collect()}
    assert set(out) == {"control", "treatment"}
    n_c, n_t = out["control"]["n"], out["treatment"]["n"]
    assert n_c + n_t == 2000
    assert abs(n_c - n_t) < 200  # md5 split is ~50/50
    assert out["control"]["z_stat"] == out["treatment"]["z_stat"]
    again = {r["variant"]: r["n"] for r in ab_assign_and_compare(
        df, "user_id", F.col("conv")).collect()}
    assert again == {v: r["n"] for v, r in out.items()}


def test_benford_truncates_first_digit_and_scores(spark):
    from magi_etl_spark.operators.drift import benford_deviation

    # 9.7 must count as digit 9 (truncation), not 1 (rounding to 10)
    df = spark.createDataFrame(
        [("g", 9.7)] * 10 + [("g", 0.5)] * 5,  # sub-1 values excluded
        "g string, v double",
    )
    out = benford_deviation(df, ["g"], "v").collect()[0]
    assert out["n"] == 10
    # all mass on digit 9 => max deviation is 1 - log10(1 + 1/9)
    import math

    assert abs(out["max_dev"] - (1 - math.log10(1 + 1 / 9))) < 1e-3

    # a perfect Benford sample scores ~0
    rows = []
    for d in range(1, 10):
        rows += [("b", float(d) * 10)] * round(1000 * math.log10(1 + 1 / d))
    df2 = spark.createDataFrame(rows, "g string, v double")
    out2 = benford_deviation(df2, ["g"], "v").collect()[0]
    assert out2["chi2"] < 2.0  # rounding residue only


def test_mutual_information_independence_and_identity(spark):
    from pyspark.sql import functions as F

    from magi_etl_spark.operators.stats import mutual_information

    # independent uniform: MI == 0
    rows = [(a, b) for a in range(4) for b in range(6) for _ in range(5)]
    df = spark.createDataFrame(rows, "a int, b int")
    out = mutual_information(df, F.col("a"), F.col("b")).collect()[0]
    assert out["mi"] == 0.0 and out["nmi"] == 0.0
    assert abs(out["h_a"] - 2.0) < 1e-6  # log2(4)

    # b == a: MI == H(a), NMI == 1
    df2 = spark.createDataFrame([(a, a) for a in range(8)] * 4, "a int, b int")
    out2 = mutual_information(df2, F.col("a"), F.col("b")).collect()[0]
    assert out2["mi"] == out2["h_a"] == 3.0
    assert out2["nmi"] == 1.0


def test_concentration_monopoly_and_even_split(spark):
    from magi_etl_spark.operators.stats import concentration

    rows = [("mono", 1, 100.0)] + [("even", k, 25.0) for k in range(4)]
    df = spark.createDataFrame(rows, "g string, k long, v double")
    out = {r["g"]: r for r in concentration(df, ["g"], "k", "v", top_k=2).collect()}
    assert out["mono"]["hhi"] == 1.0 and out["mono"]["crk"] == 1.0
    assert out["even"]["hhi"] == 0.25  # 4 * (1/4)^2
    assert out["even"]["crk"] == 0.5  # top 2 of 4 even keys
    assert out["even"]["n_keys"] == 4


def test_dow_seasonality_flat_series_is_all_ones(spark):
    import datetime as _dt

    from magi_etl_spark.operators.timeseries import dow_seasonal_index

    days = [(_dt.date(2024, 1, 1) + _dt.timedelta(days=i)) for i in range(28)]
    df = spark.createDataFrame(
        [("g", d, 10.0) for d in days], "g string, day date, v double"
    )
    out = dow_seasonal_index(df, ["g"], "day", "v").collect()
    assert len(out) == 7
    assert all(r["factor"] == 1.0 and r["n_days"] == 4 for r in out)
    assert sorted(r["dow"] for r in out) == list(range(7))


def test_correlation_matrix_known_values(spark):
    from magi_etl_spark.operators.stats import correlation_matrix

    rows = [
        ("g", float(i), 2.0 * i + 1, -3.0 * i, 5.0) for i in range(10)
    ]
    df = spark.createDataFrame(rows, "g string, a double, b double, c double, d double")
    out = {
        (r["col_a"], r["col_b"]): r["corr"]
        for r in correlation_matrix(df, ["g"], ["a", "b", "c", "d"]).collect()
    }
    assert out[("a", "b")] == 1.0   # perfectly correlated
    assert out[("a", "c")] == -1.0  # perfectly anti-correlated
    assert out[("a", "d")] is None  # zero-variance column
    assert len(out) == 6


def test_personalized_pagerank_concentrates_on_seeds(spark):
    from pyspark.sql import functions as F

    from magi_etl_spark.operators.graph import pagerank

    # chain 1 -> 2 -> 3 and an isolated pair 10 -> 11
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(1,)], "v long")
    out = {
        r["vertex"]: r["rank"]
        for r in pagerank(
            edges, iterations=10, reset_vertices=seeds
        ).collect()
    }
    # mass reaches only the seed's component (and is conserved); the
    # within-chain ordering oscillates at finite iteration counts, so
    # only positivity is asserted there
    assert out[10] == 0.0 and out[11] == 0.0
    assert out[1] > 0 and out[2] > 0 and out[3] > 0
    assert abs(sum(out.values()) - 1.0) < 1e-9

    # seeds == all vertices degenerates to uniform-teleport pagerank
    allv = spark.createDataFrame([(v,) for v in (1, 2, 3, 10, 11)], "v long")
    a = {r["vertex"]: r["rank"] for r in pagerank(edges, iterations=5).collect()}
    b = {
        r["vertex"]: r["rank"]
        for r in pagerank(edges, iterations=5, reset_vertices=allv).collect()
    }
    for v in a:
        assert abs(a[v] - b[v]) < 1e-12


def test_fs_linkage_score_weights_and_nulls(spark):
    import math

    from magi_etl_spark.operators.linkage import fs_linkage_score

    df = spark.createDataFrame(
        [(True, True), (True, False), (None, True)],
        "f1 boolean, f2 boolean",
    )
    out = fs_linkage_score(
        df, {"f1": (0.9, 0.1), "f2": (0.8, 0.4)}
    ).collect()
    w1a, w1d = math.log2(9.0), math.log2(0.1 / 0.9)
    w2a, w2d = math.log2(2.0), math.log2(0.2 / 0.6)
    got = sorted(r["fs_score"] for r in out)
    want = sorted(
        round(x, 4) for x in (w1a + w2a, w1a + w2d, 0.0 + w2a)
    )
    assert got == want
