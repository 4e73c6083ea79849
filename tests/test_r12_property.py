"""Property tests for the r12 wave: each operator is replayed by an
independent pure-Python reference implementation on seeded random data
(the small hand fixtures live in test_r12_wave.py; the blocked-vs-naive
dbscan fixture there is widened here to a mixed-density corpus).  These
catch formula-level mistakes the hand fixtures are too small to see."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F


def test_mcnemar_matches_reference_on_random_cohorts(spark):
    from magi_etl_spark.operators.mcnemar import mcnemar_test

    rng = random.Random(23)
    rows = [
        (f"c{rng.randint(0, 2)}", rng.randint(0, 1), rng.randint(0, 1))
        for _ in range(600)
    ]
    df = spark.createDataFrame(rows, "cohort string, x1 int, x2 int")
    got = {
        r.cohort: (r.n_subjects, r.n10, r.n01, r.chi2_cc)
        for r in mcnemar_test(df, ["cohort"], F.col("x1"), F.col("x2")).collect()
    }
    for c in ("c0", "c1", "c2"):
        sub = [r for r in rows if r[0] == c]
        b = sum(1 for r in sub if r[1] == 1 and r[2] == 0)
        d = sum(1 for r in sub if r[1] == 0 and r[2] == 1)
        chi = (
            round(max(abs(b - d) - 1, 0) ** 2 / (b + d), 6)
            if b + d > 0
            else None
        )
        assert got[c] == (len(sub), b, d, chi), c


def test_kappa_matches_reference_on_random_multiclass(spark):
    from magi_etl_spark.operators.kappa import cohens_kappa

    rng = random.Random(29)
    labels = ["a", "b", "c", "d"]
    rows = []
    for _ in range(800):
        g = f"g{rng.randint(0, 1)}"
        r1 = rng.choice(labels)
        # correlated second rater: agree 60% of the time
        r2 = r1 if rng.random() < 0.6 else rng.choice(labels)
        rows.append((g, r1, r2))
    df = spark.createDataFrame(rows, "g string, r1 string, r2 string")
    got = {
        r.g: (r.n_items, r.n_agree, r.kappa)
        for r in cohens_kappa(df, ["g"], F.col("r1"), F.col("r2")).collect()
    }
    for g in ("g0", "g1"):
        sub = [r for r in rows if r[0] == g]
        n = len(sub)
        agree = sum(1 for r in sub if r[1] == r[2])
        pe_num = sum(
            sum(1 for r in sub if r[1] == k) * sum(1 for r in sub if r[2] == k)
            for k in labels
        )
        kappa = round((n * agree - pe_num) / (n * n - pe_num), 6)
        assert got[g] == (n, agree, kappa), g


def test_rmst_matches_reference_on_random_event_streams(spark):
    from magi_etl_spark.operators.rmst import restricted_mean_survival

    rng = random.Random(31)
    rows = []
    arms = {}
    for u in range(120):
        arms[u] = f"a{u % 2}"
        first = rng.randint(1, 10)
        span = rng.randint(0, 20)
        days = {first, min(first + span, 28)} | {
            rng.randint(first, min(first + span, 28))
            for _ in range(rng.randint(0, 4))
        }
        for d in days:
            rows.append((u, arms[u], f"2024-01-{d:02d} 10:00:00"))
    df = spark.createDataFrame(
        rows, "user_id long, arm string, ts string"
    ).select("user_id", "arm", F.col("ts").cast("timestamp").alias("ts"))
    tau = 9
    got = {
        r.arm: (r.n_users, r.alive_days, r.rmst_days)
        for r in restricted_mean_survival(
            df, ["arm"], "user_id", "ts", tau
        ).collect()
    }
    life = {}
    for u, _, ts in rows:
        d = int(ts[8:10])
        lo, hi = life.get(u, (d, d))
        life[u] = (min(lo, d), max(hi, d))
    for a in ("a0", "a1"):
        us = [u for u in life if arms[u] == a]
        alive = sum(min(life[u][1] - life[u][0] + 1, tau) for u in us)
        assert got[a] == (len(us), alive, round(alive / len(us), 6)), a


def test_global_spearman_handles_heavy_ties(spark):
    from magi_etl_spark.operators.rankcorr import spearman_rho

    rng = random.Random(37)
    # only 6 distinct x values and 5 distinct y values over 300 rows:
    # the doubled-average-rank arithmetic is dominated by tie groups
    xs = [rng.randint(0, 5) for _ in range(300)]
    ys = [min(4, x + rng.randint(-1, 1)) for x in xs]
    df = spark.createDataFrame(list(zip(xs, ys)), "x long, y long")
    row = spearman_rho(df, [], F.col("x"), F.col("y")).collect()[0]

    def avg_ranks(vs):
        order = sorted(range(len(vs)), key=lambda i: vs[i])
        ranks = [0.0] * len(vs)
        i = 0
        while i < len(order):
            j = i
            while j < len(order) and vs[order[j]] == vs[order[i]]:
                j += 1
            for k in range(i, j):
                ranks[order[k]] = (i + 1 + j) / 2.0
            i = j
        return ranks

    ra, rb = avg_ranks(xs), avg_ranks(ys)
    n = len(xs)
    ma, mb = sum(ra) / n, sum(rb) / n
    cov = sum((a - ma) * (b - mb) for a, b in zip(ra, rb))
    va = sum((a - ma) ** 2 for a in ra)
    vb = sum((b - mb) ** 2 for b in rb)
    assert row.n == n
    assert abs(float(row.rho) - cov / math.sqrt(va * vb)) < 1e-6


def test_mann_kendall_long_tied_series(spark):
    from magi_etl_spark.operators.mannkendall import mann_kendall_trend

    rng = random.Random(41)
    xs = [rng.randint(0, 7) + (t // 40) for t in range(240)]  # weak trend
    df = spark.createDataFrame(
        [("s", t, x) for t, x in enumerate(xs)], "series string, t long, x long"
    )
    row = mann_kendall_trend(df, ["series"], "t", F.col("x")).collect()[0]
    n = len(xs)
    s = sum(
        (xs[j] > xs[i]) - (xs[j] < xs[i])
        for i in range(n)
        for j in range(i + 1, n)
    )
    from collections import Counter

    var18 = n * (n - 1) * (2 * n + 5) - sum(
        t * (t - 1) * (2 * t + 5) for t in Counter(xs).values()
    )
    z = (s - 1) / math.sqrt(var18 / 18.0) if s > 0 else (s + 1) / math.sqrt(
        var18 / 18.0
    ) if s < 0 else 0.0
    assert (row.n, row.s, row.var_s18) == (n, s, var18)
    assert abs(float(row.z) - z) < 1e-6


def test_grid_dbscan_matches_naive_on_mixed_density(spark):
    from magi_etl_spark.operators.dbscan import grid_dbscan

    rng = random.Random(43)
    pts = []
    nid = 0
    # three blobs of different tightness + a uniform background
    for cx, cy, spread, k in [
        (0, 0, 30, 12),
        (2000, 2000, 80, 10),
        (-1500, 500, 15, 7),
    ]:
        for _ in range(k):
            pts.append(
                (
                    nid,
                    cx + rng.randint(-spread, spread),
                    cy + rng.randint(-spread, spread),
                )
            )
            nid += 1
    for _ in range(40):
        pts.append((nid, rng.randint(-4000, 4000), rng.randint(-4000, 4000)))
        nid += 1
    eps, min_pts = 120, 4
    df = spark.createDataFrame(pts, "id long, x long, y long")
    got = {
        r.id: (r.role, r.cluster)
        for r in grid_dbscan(df, eps, min_pts).collect()
    }

    loc = {i: (x, y) for i, x, y in pts}
    ids = list(loc)
    neigh = {
        a: [
            b
            for b in ids
            if (loc[a][0] - loc[b][0]) ** 2 + (loc[a][1] - loc[b][1]) ** 2
            <= eps * eps
        ]
        for a in ids
    }
    cores = {a for a in ids if len(neigh[a]) >= min_pts}
    cluster = {}
    for a in sorted(cores):
        if a in cluster:
            continue
        stack, seen = [a], {a}
        while stack:
            v = stack.pop()
            for w in neigh[v]:
                if w in cores and w not in seen:
                    seen.add(w)
                    stack.append(w)
        label = min(seen)
        for v in seen:
            cluster[v] = label
    want = {}
    for a in ids:
        if a in cores:
            want[a] = ("core", cluster[a])
        else:
            nb = [cluster[b] for b in neigh[a] if b in cores]
            want[a] = ("border", min(nb)) if nb else ("noise", None)
    assert got == want
    assert len({c for r, c in want.values() if r == "core"}) >= 2
