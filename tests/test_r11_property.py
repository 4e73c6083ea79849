"""Property tests for the r11 wave: each operator is replayed by an
independent pure-Python reference implementation on seeded random data
(the blocked-vs-naive spatial test lives in test_r11_wave.py).  These
catch formula-level mistakes the hand fixtures are too small to see."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F


def test_group_auc_matches_rank_formula_on_random_data(spark):
    """AUC from pair counts == the midrank Mann-Whitney formula."""
    from magi_etl_spark.operators.auc import group_auc

    rng = random.Random(7)
    rows = [
        ("g", rng.randint(0, 20), rng.randint(0, 1)) for _ in range(400)
    ]
    df = spark.createDataFrame(rows, "g string, s int, y int")
    got = group_auc(df, ["g"], F.col("s"), F.col("y")).collect()[0]

    # reference: midranks over the pooled sample
    vals = sorted(rows, key=lambda r: r[1])
    n = len(vals)
    midrank: dict[int, float] = {}
    i = 0
    while i < n:
        j = i
        while j < n and vals[j][1] == vals[i][1]:
            j += 1
        mr = (i + 1 + j) / 2  # average of ranks i+1..j
        midrank[vals[i][1]] = mr
        i = j
    pos = [r for r in rows if r[2] == 1]
    neg = [r for r in rows if r[2] == 0]
    r_pos = sum(midrank[r[1]] for r in pos)
    u = r_pos - len(pos) * (len(pos) + 1) / 2
    auc_ref = u / (len(pos) * len(neg))
    assert got.n_pos == len(pos) and got.n_neg == len(neg)
    assert abs(got.auc - auc_ref) < 1e-6
    assert got.u2 == round(2 * u)


def test_autocorrelation_matches_direct_formula_on_random_series(spark):
    from magi_etl_spark.operators.acf import autocorrelation

    rng = random.Random(11)
    xs = [rng.randint(0, 50) for _ in range(60)]
    df = spark.createDataFrame(
        [("s", t, x) for t, x in enumerate(xs)], "g string, t int, x int"
    )
    got = {
        r.k: r.r_k
        for r in autocorrelation(df, ["g"], "t", F.col("x"), 5).collect()
    }
    n = len(xs)
    m = sum(xs) / n
    den = sum((x - m) ** 2 for x in xs)
    for k in range(1, 6):
        num = sum((xs[t] - m) * (xs[t + k] - m) for t in range(n - k))
        assert abs(got[k] - num / den) < 1e-6, k


def test_bh_matches_reference_step_up_on_random_pvalues(spark):
    from magi_etl_spark.operators.fdr import bh_summary

    rng = random.Random(13)
    ps = [rng.randint(0, 1_000_000) for _ in range(300)]
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(ps)], "hid int, p long"
    )
    s = bh_summary(df, "p", ["hid"], 1, 10).collect()[0]  # alpha = 10%
    m = len(ps)
    srt = sorted(ps)
    k_star = max(
        (i for i in range(1, m + 1) if srt[i - 1] * m * 10 <= i * 1 * 1_000_000),
        default=None,
    )
    if k_star is None:
        assert (s.k_star, s.n_rejected) == (None, 0)
    else:
        p_star = srt[k_star - 1]
        assert (s.k_star, s.p_star_micro) == (k_star, p_star)
        assert s.n_rejected == sum(1 for p in ps if p <= p_star)


def test_cmh_matches_reference_on_random_strata(spark):
    from magi_etl_spark.operators.cmh import cmh_test

    rng = random.Random(17)
    rows = []
    for st in range(6):
        for _ in range(rng.randint(20, 60)):
            rows.append((st, rng.choice(["A", "B"]), rng.randint(0, 1)))
    df = spark.createDataFrame(rows, "st int, g string, y int")
    got = cmh_test(df, ["st"], F.col("g"), F.col("y"), "A", "B").collect()[0]

    sum_a = sum_e = sum_v = orn = ord_ = 0.0
    n_strata = 0
    for st in range(6):
        a = sum(1 for r in rows if r[0] == st and r[1] == "A" and r[2] == 1)
        b = sum(1 for r in rows if r[0] == st and r[1] == "A" and r[2] == 0)
        c = sum(1 for r in rows if r[0] == st and r[1] == "B" and r[2] == 1)
        d = sum(1 for r in rows if r[0] == st and r[1] == "B" and r[2] == 0)
        n = a + b + c + d
        if n < 2 or not (a + b and c + d and a + c and b + d):
            continue
        n_strata += 1
        sum_a += a
        sum_e += (a + b) * (a + c) / n
        sum_v += (a + b) * (c + d) * (a + c) * (b + d) / (n * n * (n - 1))
        orn += a * d / n
        ord_ += b * c / n
    assert got.n_strata == n_strata and got.sum_a == sum_a
    assert abs(got.expected_a - sum_e) < 1e-5
    assert abs(got.chi2 - (sum_a - sum_e) ** 2 / sum_v) < 1e-5
    assert abs(got.or_mh - orn / ord_) < 1e-5


def test_ndcg_matches_reference_on_random_grades(spark):
    from magi_etl_spark.operators.ndcg import ndcg_at_k

    rng = random.Random(19)
    cands = [(i, rng.randint(0, 3)) for i in range(40)]
    df = spark.createDataFrame(
        [("q", i, rel) for i, rel in cands], "q string, pos int, rel int"
    )
    got = ndcg_at_k(df, ["q"], [F.asc("pos")], F.col("rel"), 10).collect()[0]
    dcg = sum(
        (2**rel - 1) / math.log2(i + 2)
        for i, (_, rel) in enumerate(cands[:10])
    )
    ideal = sorted((rel for _, rel in cands), reverse=True)[:10]
    idcg = sum((2**rel - 1) / math.log2(i + 2) for i, rel in enumerate(ideal))
    assert abs(got.dcg - dcg) < 1e-5
    assert abs(got.idcg - idcg) < 1e-5
    assert abs(got.ndcg - dcg / idcg) < 1e-5


def test_nearest_in_radius_matches_naive_on_random_points(spark):
    from magi_etl_spark.operators.spatial import nearest_in_radius

    rng = random.Random(23)
    lefts = [(i, rng.randint(-500, 500), rng.randint(-500, 500))
             for i in range(40)]
    rights = [(100 + i, rng.randint(-500, 500), rng.randint(-500, 500))
              for i in range(60)]
    eps = 200
    ldf = spark.createDataFrame(lefts, "lid long, x long, y long")
    rdf = spark.createDataFrame(rights, "rid long, x long, y long")
    got = {
        r.lid: (r.rid, r.dist2)
        for r in nearest_in_radius(ldf, rdf, eps, ["lid"], ["rid"]).collect()
    }
    want = {}
    for lid, lx, ly in lefts:
        best = None
        for rid, rx, ry in rights:
            d2 = (lx - rx) ** 2 + (ly - ry) ** 2
            if d2 <= eps * eps and (best is None or (d2, rid) < best):
                best = (d2, rid)
        if best is not None:
            want[lid] = (best[1], best[0])
    assert want, "fixture produced no neighbors — raise density"
    assert got == want
