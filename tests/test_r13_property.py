"""Property tests for the r13 wave: each operator is replayed by an
independent pure-Python reference implementation on seeded random data
(the small hand fixtures live in test_r13_wave.py).  These catch
formula-level mistakes the hand fixtures are too small to see —
heavy-tie rank paths, multi-round IPF drift, argmax tie landscapes,
bin-edge placement, ordinal-scale weighting."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F


def _half_up(x: float) -> int:
    return math.floor(x + 0.5)


def test_rake_weights_matches_reference_on_random_tables(spark):
    from magi_etl_spark.operators.raking import rake_weights

    rng = random.Random(41)
    rows = [
        (f"r{rng.randint(0, 4)}", f"c{rng.randint(0, 6)}")
        for _ in range(2_000)
    ]
    df = spark.createDataFrame(rows, "r string, c string")
    # targets: a perturbed copy of the observed marginals (some zero)
    from collections import Counter

    rcnt = Counter(r for r, _ in rows)
    ccnt = Counter(c for _, c in rows)
    rtgt = {k: max(0, v + rng.randint(-80, 80)) for k, v in rcnt.items()}
    ctgt = {k: max(0, v + rng.randint(-80, 80)) for k, v in ccnt.items()}
    rt = spark.createDataFrame(
        [(k, v) for k, v in rtgt.items()], "r string, target long"
    )
    ct = spark.createDataFrame(
        [(k, v) for k, v in ctgt.items()], "c string, target long"
    )
    got = {
        (row.r, row.c): (row.n, row.w_micro)
        for row in rake_weights(df, "r", "c", rt, ct, rounds=4).collect()
    }
    # pure-Python replay with the identical operand order and half-up
    # rounding
    cells = Counter(rows)
    w = {k: n * 1_000_000 for k, n in cells.items()}
    for _ in range(4):
        for side, tgt in ((0, rtgt), (1, ctgt)):
            for cat, t in tgt.items():
                s = sum(v for k, v in w.items() if k[side] == cat)
                if s > 0 and t > 0:
                    ratio = float(t) * 1_000_000.0 / float(s)
                    for k in list(w):
                        if k[side] == cat:
                            w[k] = _half_up(w[k] * ratio)
    assert got == {k: (cells[k], wk) for k, wk in w.items()}


def test_kruskal_matches_reference_on_heavy_ties(spark):
    from magi_etl_spark.operators.kruskal import kruskal_wallis

    rng = random.Random(43)
    rows = []
    for key in ("k0", "k1"):
        for _ in range(700):
            g = f"g{rng.randint(0, 3)}"
            # heavy ties: values from a tiny lattice, group-shifted so
            # there is real signal
            v = rng.randint(0, 8) + (1 if g == "g2" else 0)
            rows.append((key, g, v))
    df = spark.createDataFrame(rows, "key string, g string, x int")
    got = {
        r.key: r
        for r in kruskal_wallis(df, ["key"], "g", F.col("x")).collect()
    }
    from collections import Counter, defaultdict

    for key in ("k0", "k1"):
        sub = [(g, v) for k, g, v in rows if k == key]
        groups = defaultdict(list)
        for g, v in sub:
            groups[g].append(v)
        cnt = Counter(v for _, v in sub)
        avg, acc = {}, 0
        for v in sorted(cnt):
            avg[v] = acc + (cnt[v] + 1) / 2
            acc += cnt[v]
        n = len(sub)
        h = (
            12.0 / (n * (n + 1))
            * sum(
                sum(avg[v] for v in vs) ** 2 / len(vs)
                for vs in groups.values()
            )
            - 3.0 * (n + 1)
        )
        c = 1.0 - sum(t**3 - t for t in cnt.values()) / (n**3 - n)
        assert got[key].n == n and got[key].k_groups == len(groups)
        assert got[key].h == pytest.approx(h / c, abs=1e-4), key


def test_cusum_change_point_matches_brute_force(spark):
    from magi_etl_spark.operators.pagehinkley import cusum_change_point

    rng = random.Random(47)
    rows = []
    want = {}
    for si in range(8):
        series = f"s{si}"
        n = rng.randint(1, 40)
        shift = rng.randint(0, n)
        xs = [
            rng.randint(0, 5) + (7 if i >= shift else 0) for i in range(n)
        ]
        rows += [(series, i + 1, x) for i, x in enumerate(xs)]
        # brute force on exact integers
        s = sum(xs)
        best = None
        for t in range(1, n):
            c = sum(xs[:t])
            d = abs(n * c - t * s)
            if best is None or d > best[0]:
                best = (d, t)
        if best is None or best[0] == 0:
            cp = None
            dmax = None if n < 2 else 0.0
        else:
            cp = best[1]
            dmax = round(best[0] / n, 6)
        want[series] = (n, cp, dmax)
    df = spark.createDataFrame(rows, "series string, t int, x int")
    got = {
        r.series: (r.n, r.cp, r.dmax)
        for r in cusum_change_point(df, ["series"], "t", F.col("x")).collect()
    }
    assert got == {
        k: (n, cp, pytest.approx(dmax) if dmax is not None else None)
        for k, (n, cp, dmax) in want.items()
    }


def test_brier_bins_match_reference_on_random_grid(spark):
    from magi_etl_spark.operators.brier import reliability_brier_bins

    rng = random.Random(53)
    rows = [
        (
            f"g{rng.randint(0, 1)}",
            rng.choice([0, 1, 99_999, 100_000, 500_001, 999_999, 1_000_000]),
            rng.randint(0, 1),
        )
        for _ in range(1_500)
    ]
    df = spark.createDataFrame(rows, "g string, p long, y int")
    got = {
        (r.g, r.bin): (r.n, r.mean_p, r.event_rate, r.brier)
        for r in reliability_brier_bins(
            df, ["g"], F.col("p"), F.col("y"), n_bins=10
        ).collect()
    }
    from collections import defaultdict

    agg = defaultdict(list)
    for g, p, y in rows:
        agg[(g, min(p * 10 // 1_000_000, 9))].append((p, y))
    for k, vs in agg.items():
        n = len(vs)
        sp = sum(p for p, _ in vs)
        sy = sum(y for _, y in vs)
        sse = sum((p - y * 1_000_000) ** 2 for p, y in vs)
        gn, gm, ge, gb = got[k]
        assert gn == n
        assert gm == pytest.approx(round(sp / (n * 1e6), 6), abs=1e-9)
        assert ge == pytest.approx(round(sy / n, 6), abs=1e-9)
        assert gb == pytest.approx(round(sse / (n * 1e12), 6), abs=1e-9)


def test_weighted_kappa_matches_reference_on_random_ordinal(spark):
    from magi_etl_spark.operators.wkappa import weighted_kappa

    rng = random.Random(59)
    rows = []
    for _ in range(900):
        g = f"g{rng.randint(0, 2)}"
        i = rng.randint(0, 4)
        # correlated ordinal second rater: usually within 1 step
        j = min(4, max(0, i + rng.choice([-1, 0, 0, 0, 1, 2])))
        rows.append((g, i, j))
    df = spark.createDataFrame(rows, "g string, r1 int, r2 int")
    for weighting in ("linear", "quadratic"):
        got = {
            r.g: (r.n_items, r.kappa_w)
            for r in weighted_kappa(
                df, ["g"], F.col("r1"), F.col("r2"), weighting
            ).collect()
        }
        from collections import Counter

        for g in ("g0", "g1", "g2"):
            sub = [(i, j) for gg, i, j in rows if gg == g]
            o = Counter(sub)
            n = len(sub)
            row = Counter(i for i, _ in sub)
            col = Counter(j for _, j in sub)

            def v(i, j):
                return (i - j) ** 2 if weighting == "quadratic" else abs(i - j)

            vo = sum(v(i, j) * c for (i, j), c in o.items())
            ve = sum(v(i, j) * row[i] * col[j] for i in row for j in col)
            want = round(1.0 - n * vo / ve, 6) if ve > 0 else None
            assert got[g][0] == n
            assert got[g][1] == pytest.approx(want, abs=1e-6), (g, weighting)


def test_dbscan_profile_matches_naive_reference_on_mixed_density(spark):
    from magi_etl_spark.operators.dbscan import grid_dbscan
    from magi_etl_spark.operators.dbstability import dbscan_cluster_profile

    rng = random.Random(61)
    pts = []
    # a dense blob (mostly core), a sparse chain (border-heavy), noise
    for i in range(30):
        pts.append((i, rng.randint(0, 12), rng.randint(0, 12)))
    for i in range(10):
        pts.append((100 + i, 1000 + 7 * i, 0))
    for i in range(8):
        pts.append((200 + i, 10_000 + 300 * i, 9_000))
    eps, min_pts = 8, 5
    df = spark.createDataFrame(pts, "id long, x long, y long")
    got = {
        r.cluster: (r.n_points, r.n_core, r.n_border, r.border_ratio)
        for r in dbscan_cluster_profile(
            grid_dbscan(df, eps, min_pts)
        ).collect()
    }
    # naive reference: all-pairs neighborhoods, BFS over core graph,
    # border = non-core with a core neighbor (min cluster label)
    ids = [p[0] for p in pts]
    xy = {p[0]: (p[1], p[2]) for p in pts}
    near = {
        a: {
            b
            for b in ids
            if (xy[a][0] - xy[b][0]) ** 2 + (xy[a][1] - xy[b][1]) ** 2
            <= eps * eps
        }
        for a in ids
    }
    cores = {a for a in ids if len(near[a]) >= min_pts}
    label = {}
    for a in sorted(cores):
        if a in label:
            continue
        comp, stack = set(), [a]
        while stack:
            v = stack.pop()
            if v in comp:
                continue
            comp.add(v)
            stack += [u for u in near[v] if u in cores and u not in comp]
        root = min(comp)
        for v in comp:
            label[v] = root
    prof = {}
    for a in ids:
        if a in cores:
            cl, role = label[a], "core"
        else:
            neigh = [label[b] for b in near[a] if b in cores]
            if not neigh:
                continue
            cl, role = min(neigh), "border"
        np_, nc, nb = prof.get(cl, (0, 0, 0))
        prof[cl] = (
            np_ + 1,
            nc + (role == "core"),
            nb + (role == "border"),
        )
    want = {
        cl: (np_, nc, nb, round(nb / np_, 6))
        for cl, (np_, nc, nb) in prof.items()
    }
    assert got == {
        cl: (np_, nc, nb, pytest.approx(br))
        for cl, (np_, nc, nb, br) in want.items()
    }
