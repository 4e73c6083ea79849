"""Round-15 wave operator semantics, pinned on hand fixtures against
pure-Python reference implementations (the same brute-force-replica
discipline as tests/test_r14_wave.py): Page's L ordered-block trend,
Kendall's W concordance, Cochran's Q matched binary treatments,
Brunner–Munzel unequal-variance two-sample, the Hodges–Lehmann shift
estimator, and Grubbs' max-studentized outlier test."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F


def _midranks(xs):
    """1-based average ranks of xs (with ties averaged)."""
    s = sorted(xs)
    return [
        sum(1 for u in s if u < v) + (sum(1 for u in s if u == v) + 1) / 2
        for v in xs
    ]


# --- Page's L ---------------------------------------------------------------


def _py_page(vals: dict, nb: int, k: int) -> tuple[float, float]:
    R = [0.0] * k
    for b in range(nb):
        ranks = _midranks([vals[(b, g)] for g in range(k)])
        for g in range(k):
            R[g] += ranks[g]
    L = sum((j + 1) * R[j] for j in range(k))
    mean = nb * k * (k + 1) ** 2 / 4
    var = nb * k * k * (k + 1) ** 2 * (k - 1) / 144
    return L, (L - mean) / math.sqrt(var)


def test_page_matches_reference_with_ties(spark):
    from magi_etl_spark.operators.pagetest import page_trend_test

    random.seed(11)
    rows, vals = [], {}
    for b in range(6):
        for g in range(4):
            v = random.randint(0, 4) + g  # monotone drift + ties
            rows.append(("k1", b, g, v))
            vals[(b, g)] = v
    df = spark.createDataFrame(rows, "key string, b int, g int, x int")
    out = page_trend_test(df, ["key"], "b", "g", F.col("x")).collect()[0]
    L, z = _py_page(vals, 6, 4)
    assert (out.k_treat, out.n_blocks) == (4, 6)
    assert out.l2 == round(2 * L)
    assert abs(out.z - round(z, 6)) < 1e-9


def test_page_drops_incomplete_blocks_and_degenerate_keys(spark):
    from magi_etl_spark.operators.pagetest import page_trend_test

    rows = [("k1", b, g, b + g) for b in range(3) for g in range(3)]
    rows += [("k1", 99, 0, 1), ("k2", 0, 0, 1)]
    df = spark.createDataFrame(rows, "key string, b int, g int, x int")
    got = {
        r.key: r
        for r in page_trend_test(df, ["key"], "b", "g", F.col("x")).collect()
    }
    assert got["k1"].n_blocks == 3
    # perfectly monotone: every block ranks 1,2,3 -> L = b * sum j*j
    assert got["k1"].l2 == 2 * 3 * (1 + 4 + 9)
    assert got["k2"].k_treat == 1 and got["k2"].z is None
    with pytest.raises(ValueError, match="non-empty"):
        page_trend_test(df, [], "b", "g", F.col("x"))


# --- Kendall's W ------------------------------------------------------------


def _py_w(vals: dict, m: int, k: int) -> float:
    R = [0.0] * k
    T = 0.0
    for b in range(m):
        xs = [vals[(b, g)] for g in range(k)]
        ranks = _midranks(xs)
        for g in range(k):
            R[g] += ranks[g]
        for v in set(xs):
            t = xs.count(v)
            T += t**3 - t
    S = sum((r - m * (k + 1) / 2) ** 2 for r in R)
    return 12 * S / (m * m * (k**3 - k) - m * T)


def test_kendalls_w_matches_reference_with_ties(spark):
    from magi_etl_spark.operators.kendallw import kendalls_w

    random.seed(13)
    rows, vals = [], {}
    for b in range(5):
        for g in range(4):
            v = random.randint(0, 3) + (g if b % 2 == 0 else 0)
            rows.append(("k1", b, g, v))
            vals[(b, g)] = v
    df = spark.createDataFrame(rows, "key string, b int, g int, x int")
    out = kendalls_w(df, ["key"], "b", "g", F.col("x")).collect()[0]
    assert (out.k_items, out.m_raters) == (4, 5)
    assert abs(out.w - round(_py_w(vals, 5, 4), 6)) < 1e-9


def test_kendalls_w_perfect_concordance_is_one(spark):
    from magi_etl_spark.operators.kendallw import kendalls_w

    rows = [("k", b, g, g * 10) for b in range(4) for g in range(5)]
    df = spark.createDataFrame(rows, "key string, b int, g int, x int")
    out = kendalls_w(df, ["key"], "b", "g", F.col("x")).collect()[0]
    assert out.w == 1.0


def test_kendalls_w_all_tied_raters_emit_null(spark):
    from magi_etl_spark.operators.kendallw import kendalls_w

    rows = [("k", b, g, 7) for b in range(3) for g in range(3)]
    df = spark.createDataFrame(rows, "key string, b int, g int, x int")
    out = kendalls_w(df, ["key"], "b", "g", F.col("x")).collect()[0]
    assert out.w is None  # denominator 0: no information in the panel


# --- Cochran's Q ------------------------------------------------------------


def _py_cochran(grid: dict, nb: int, k: int) -> float:
    C = [sum(grid.get((b, g), 0) for b in range(nb)) for g in range(k)]
    Rr = [sum(grid.get((b, g), 0) for g in range(k)) for b in range(nb)]
    N = sum(C)
    num = (k - 1) * (k * sum(c * c for c in C) - N * N)
    den = k * N - sum(r * r for r in Rr)
    return num / den


def test_cochran_q_matches_reference(spark):
    from magi_etl_spark.operators.cochranq import cochran_q

    random.seed(17)
    rows, grid = [], {}
    for b in range(8):
        for g in range(3):
            x = 1 if random.random() < 0.3 + 0.2 * g else 0
            rows.append(("k1", b, g, x))
            grid[(b, g)] = x
    df = spark.createDataFrame(rows, "key string, b int, g int, x int")
    out = cochran_q(df, ["key"], "b", "g", F.col("x")).collect()[0]
    assert (out.k_treat, out.n_blocks) == (3, 8)
    assert abs(out.q - round(_py_cochran(grid, 8, 3), 6)) < 1e-9


def test_cochran_q_completes_absent_cells_as_zero(spark):
    from magi_etl_spark.operators.cochranq import cochran_q

    # block 2 never saw treatment 1: absent cell counts as response 0,
    # NOT as a dropped block — the grid-completion contract
    rows = [
        ("k", 0, 0, 1), ("k", 0, 1, 0),
        ("k", 1, 0, 1), ("k", 1, 1, 1),
        ("k", 2, 0, 0),  # (2, 1) absent
    ]
    df = spark.createDataFrame(rows, "key string, b int, g int, x int")
    out = cochran_q(df, ["key"], "b", "g", F.col("x")).collect()[0]
    grid = {(0, 0): 1, (0, 1): 0, (1, 0): 1, (1, 1): 1, (2, 0): 0, (2, 1): 0}
    assert out.n_blocks == 3
    assert abs(out.q - round(_py_cochran(grid, 3, 2), 6)) < 1e-9


def test_cochran_q_no_discordance_emits_null(spark):
    from magi_etl_spark.operators.cochranq import cochran_q

    # every block all-1: k*N == sum R^2 -> denominator 0 -> NULL
    rows = [("k", b, g, 1) for b in range(3) for g in range(2)]
    df = spark.createDataFrame(rows, "key string, b int, g int, x int")
    out = cochran_q(df, ["key"], "b", "g", F.col("x")).collect()[0]
    assert out.q is None


# --- Brunner–Munzel ---------------------------------------------------------


def _py_bm(x1: list, x2: list) -> tuple[float, float]:
    n1, n2, N = len(x1), len(x2), len(x1) + len(x2)
    pooled = _midranks(x1 + x2)
    r1, r2 = pooled[:n1], pooled[n1:]
    w1, w2 = _midranks(x1), _midranks(x2)
    p1 = [a - b for a, b in zip(r1, w1)]
    p2 = [a - b for a, b in zip(r2, w2)]
    m1, m2 = sum(p1) / n1, sum(p2) / n2
    s1 = sum((p - m1) ** 2 for p in p1) / (n1 - 1)
    s2 = sum((p - m2) ** 2 for p in p2) / (n2 - 1)
    rb1, rb2 = sum(r1) / n1, sum(r2) / n2
    p_hat = (rb2 - (n2 + 1) / 2) / n1
    w = n1 * n2 * (rb2 - rb1) / (N * math.sqrt(n1 * s1 + n2 * s2))
    return p_hat, w


def test_brunner_munzel_matches_reference_with_ties(spark):
    from magi_etl_spark.operators.brunnermunzel import brunner_munzel

    random.seed(19)
    x1 = [random.randint(0, 12) for _ in range(9)]
    x2 = [random.randint(3, 20) for _ in range(13)]
    rows = [("k", 1, v) for v in x1] + [("k", 0, v) for v in x2]
    df = spark.createDataFrame(rows, "key string, s int, x int")
    out = brunner_munzel(df, ["key"], F.col("s") == 1, F.col("x")).collect()[0]
    p_hat, w = _py_bm(x1, x2)
    assert (out.n1, out.n2) == (9, 13)
    assert abs(out.p_hat - round(p_hat, 6)) < 1e-9
    assert abs(out.w - round(w, 6)) < 1e-9


def test_brunner_munzel_null_indicator_rows_are_dropped(spark):
    from magi_etl_spark.operators.brunnermunzel import brunner_munzel

    rows = [("k", 1, v) for v in (3, 5, 8)] + [("k", 0, v) for v in (4, 6, 9)]
    clean = spark.createDataFrame(rows, "key string, s int, x int")
    noisy = spark.createDataFrame(
        rows + [("k", None, 7), ("k", None, 100)], "key string, s int, x int"
    )
    want = brunner_munzel(clean, ["key"], F.col("s") == 1, F.col("x")).collect()
    got = brunner_munzel(noisy, ["key"], F.col("s") == 1, F.col("x")).collect()
    assert [r.asDict() for r in got] == [r.asDict() for r in want]


def test_brunner_munzel_disjoint_samples_emit_null_w(spark):
    from magi_etl_spark.operators.brunnermunzel import brunner_munzel

    # no overlap: every placement is constant -> radicand 0 -> w NULL
    # (scipy returns +/-inf here; NULL is the engine's mannkendall
    # posture) but p_hat is still 1.0 (total dominance of sample 2)
    rows = [("k", 1, v) for v in (1, 2, 3)] + [("k", 0, v) for v in (10, 11, 12)]
    df = spark.createDataFrame(rows, "key string, s int, x int")
    out = brunner_munzel(df, ["key"], F.col("s") == 1, F.col("x")).collect()[0]
    assert out.w is None
    assert out.p_hat == 1.0


# --- Hodges–Lehmann ---------------------------------------------------------


def _py_hl2(x1: list, x2: list) -> int:
    ds = sorted(a - b for a in x1 for b in x2)
    T = len(ds)
    lo = ds[(T + 1) // 2 - 1]
    hi = ds[T // 2]
    return lo + hi


def test_hodges_lehmann_matches_brute_force(spark):
    from magi_etl_spark.operators.hodgeslehmann import hodges_lehmann_shift

    random.seed(23)
    x1 = [random.randint(0, 30) for _ in range(11)]
    x2 = [random.randint(-5, 20) for _ in range(8)]
    rows = [("k", 1, v) for v in x1] + [("k", 0, v) for v in x2]
    df = spark.createDataFrame(rows, "key string, s int, x int")
    out = hodges_lehmann_shift(
        df, ["key"], F.col("s") == 1, F.col("x")
    ).collect()[0]
    assert (out.n1, out.n2) == (11, 8)
    assert out.hl2 == _py_hl2(x1, x2)
    assert out.hl == _py_hl2(x1, x2) / 2


def test_hodges_lehmann_odd_and_even_pair_counts(spark):
    from magi_etl_spark.operators.hodgeslehmann import hodges_lehmann_shift

    # 1x1 = 1 pair (odd): hl = the single difference; 2x2 = 4 (even):
    # hl = mean of the two middle differences
    for x1, x2 in ([(7,), (3,)], [(1, 5), (0, 2)]):
        rows = [("k", 1, v) for v in x1] + [("k", 0, v) for v in x2]
        df = spark.createDataFrame(rows, "key string, s int, x int")
        out = hodges_lehmann_shift(
            df, ["key"], F.col("s") == 1, F.col("x")
        ).collect()[0]
        assert out.hl2 == _py_hl2(list(x1), list(x2))


def test_hodges_lehmann_max_cells_guard_bites(spark):
    from magi_etl_spark.operators.hodgeslehmann import hodges_lehmann_shift

    rows = [("k", i % 2, i) for i in range(40)]
    df = spark.createDataFrame(rows, "key string, s int, x int")
    with pytest.raises(ValueError, match="max_cells"):
        hodges_lehmann_shift(
            df, ["key"], F.col("s") == 1, F.col("x"), max_cells=10
        )
    # and None disables the guard
    assert (
        hodges_lehmann_shift(
            df, ["key"], F.col("s") == 1, F.col("x"), max_cells=None
        ).count()
        == 1
    )


# --- Grubbs -----------------------------------------------------------------


def _py_grubbs(xs: list) -> tuple[float, int]:
    n = len(xs)
    mean = sum(xs) / n
    s = math.sqrt(sum((x - mean) ** 2 for x in xs) / (n - 1))
    g = max(abs(x - mean) for x in xs) / s
    dev = max(abs(x - mean) for x in xs)
    x_out = max(x for x in xs if abs(x - mean) == dev)
    return g, x_out


def test_grubbs_matches_reference(spark):
    from magi_etl_spark.operators.grubbs import grubbs_test

    random.seed(29)
    xs = [random.randint(40, 60) for _ in range(20)] + [95]
    df = spark.createDataFrame(
        [("k", v) for v in xs], "key string, x int"
    )
    out = grubbs_test(df, ["key"], F.col("x")).collect()[0]
    g, x_out = _py_grubbs(xs)
    assert out.n == 21
    assert out.x_out == x_out == 95
    assert abs(out.g - round(g, 6)) < 1e-9


def test_grubbs_tie_break_prefers_larger_value(spark):
    from magi_etl_spark.operators.grubbs import grubbs_test

    # 0 and 10 are equally extreme around mean 5: report the LARGER
    df = spark.createDataFrame(
        [("k", v) for v in (0, 5, 5, 10)], "key string, x int"
    )
    out = grubbs_test(df, ["key"], F.col("x")).collect()[0]
    assert out.x_out == 10


def test_grubbs_degenerate_keys_emit_null(spark):
    from magi_etl_spark.operators.grubbs import grubbs_test

    rows = [("small", 1), ("small", 2), ("const", 4), ("const", 4), ("const", 4)]
    df = spark.createDataFrame(rows, "key string, x int")
    got = {r.key: r for r in grubbs_test(df, ["key"], F.col("x")).collect()}
    assert got["small"].g is None  # n < 3
    assert got["const"].g is None  # zero variance
    with pytest.raises(ValueError, match="non-empty"):
        grubbs_test(df, [], F.col("x"))
