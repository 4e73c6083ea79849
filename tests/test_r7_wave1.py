"""Invariant tests for the r7 operator wave (engagement, inequality,
mlprep, changepoint, winnow, setjoin, textsignals, dimjoin, kcore) —
single-threaded Python references and algebraic guarantees the DuckDB
oracles can't express (coverage guarantees, losslessness, exactness)."""

from __future__ import annotations

from fractions import Fraction

import pytest
from pyspark.sql import functions as F


# --- winnowing ---------------------------------------------------------------


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_winnow_coverage_guarantee(spark):
    """Two documents sharing a run of >= w + k - 1 = 6 tokens MUST
    share a fingerprint (SIGMOD'03 theorem 1)."""
    from magi_etl_spark.operators.winnow import winnow_fingerprints

    shared = "alpha beta gamma delta epsilon zeta"  # 6 tokens
    docs = _docs(
        spark,
        [
            (1, f"one two three {shared} four five six"),
            (2, f"seven eight {shared} nine ten eleven twelve"),
        ],
    )
    fps = winnow_fingerprints(docs).collect()
    h1 = {r.fp_hash for r in fps if r.doc_id == 1}
    h2 = {r.fp_hash for r in fps if r.doc_id == 2}
    assert h1 & h2, "shared 6-token run produced no shared fingerprint"


def test_winnow_every_window_is_covered(spark):
    """Per-window guarantee: every window of w consecutive grams
    contains at least one selected position."""
    from magi_etl_spark.operators.winnow import winnow_fingerprints

    text = " ".join(f"tok{i % 7}x{i % 3}" for i in range(40))
    docs = _docs(spark, [(1, text)])
    sel = sorted(r.pos for r in winnow_fingerprints(docs, w=4).collect())
    n_grams = 40 - 3 + 1
    for j in range(n_grams - 3):
        assert any(j <= p <= j + 3 for p in sel), f"window {j} uncovered"


def test_winnow_gram_size_follows_k(spark):
    """r7 ADVICE regression: the gram build used hardcoded lead(1)/lead(2)
    (3-token grams) regardless of k, so k=2 silently hashed 3-token
    interior grams and k>3 hashed 3-token grams gated as k-grams.  With
    w=1 every gram is its own fingerprint, so gram semantics are directly
    observable through hash equality: two docs agreeing on exactly their
    first k tokens must share the position-0 fingerprint (and only
    same-k-prefix grams may collide — all tokens are otherwise unique)."""
    from magi_etl_spark.operators.winnow import winnow_fingerprints

    for k in (2, 5):
        prefix = " ".join(f"s{i}" for i in range(k))
        docs = _docs(
            spark,
            [(1, f"{prefix} a1 a2 a3"), (2, f"{prefix} b1 b2 b3")],
        )
        rows = winnow_fingerprints(docs, k=k, w=1).collect()
        by_doc = {
            d: {r.pos: r.fp_hash for r in rows if r.doc_id == d} for d in (1, 2)
        }
        # a doc with k+3 tokens has exactly 4 full k-grams
        assert set(by_doc[1]) == set(by_doc[2]) == {0, 1, 2, 3}, by_doc
        # the k-token prefix gram matches; every gram touching the
        # divergent tail does not (the buggy k=2 build hashed
        # "s0 s1 a1" vs "s0 s1 b1" at pos 0 — a mismatch)
        assert by_doc[1][0] == by_doc[2][0], f"k={k}: prefix gram differs"
        for p in (1, 2, 3):
            assert by_doc[1][p] != by_doc[2][p], f"k={k}: tail gram collides"


def test_winnow_pairs_requires_min_shared(spark):
    from magi_etl_spark.operators.winnow import (
        fingerprint_pairs,
        winnow_fingerprints,
    )

    run = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = _docs(
        spark,
        [
            (1, f"{run} filler one two"),
            (2, f"{run} other words here"),
            (3, "completely different text with nothing in common at all"),
        ],
    )
    pairs = fingerprint_pairs(
        winnow_fingerprints(docs), min_shared=2
    ).collect()
    assert {(r.doc_a, r.doc_b) for r in pairs} == {(1, 2)}


# --- prefix-filter set-similarity join --------------------------------------


def test_similarity_join_equals_brute_force(spark, sf_dir):
    """Prefix filtering is lossless: the join equals the all-pairs
    Python scan on the real documents' shingle sets."""
    from magi_etl_spark.operators.setjoin import shingle_sets, similarity_join
    from magi_etl_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents").limit(120)
    sets_df = shingle_sets(docs)
    got = {
        (r.doc_a, r.doc_b): (r.inter_size, r.union_size)
        for r in similarity_join(sets_df, Fraction(1, 2)).collect()
    }
    sets: dict[int, set] = {}
    for r in sets_df.collect():
        sets.setdefault(r.doc_id, set()).add(r.tok)
    want = {}
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if inter * 2 >= union:
                want[(a, b)] = (inter, union)
    assert got == want


def test_similarity_join_threshold_is_integer_exact(spark):
    """A pair at exactly the threshold is kept; just under is dropped."""
    from magi_etl_spark.operators.setjoin import similarity_join

    # A={1..4}, B={1,2,3,5}: inter=3, union=5 -> 3/5 >= 1/2 keep
    # C={1..4}, D={5,6,7,1}: inter=1, union=7 -> drop at 1/2
    rows = (
        [(1, f"t{i}") for i in (1, 2, 3, 4)]
        + [(2, f"t{i}") for i in (1, 2, 3, 5)]
        + [(3, f"u{i}") for i in (1, 2, 3, 4)]
        + [(4, f"u{i}") for i in (5, 6, 7, 1)]
    )
    sets_df = spark.createDataFrame(rows, "doc_id long, tok string")
    got = {
        (r.doc_a, r.doc_b) for r in similarity_join(sets_df).collect()
    }
    assert (1, 2) in got and (3, 4) not in got


# --- changepoint -------------------------------------------------------------


def _series_df(spark, xs):
    return spark.createDataFrame(
        [("s", i, x) for i, x in enumerate(xs)],
        "series string, day int, x long",
    )


def _cusum_ref(xs, h_mult=5):
    k = sum(xs) // len(xs)
    h = (sum(abs(x - k) for x in xs) // len(xs)) * h_mult
    sp = sn = 0
    out = []
    for x in xs:
        sp = max(0, sp + x - k)
        sn = max(0, sn + k - x)
        out.append((sp, sn, 1 if (sp > h or sn > h) else 0))
    return out


def test_cusum_matches_python_reference(spark):
    from magi_etl_spark.operators.changepoint import cusum_profile

    import random

    rng = random.Random(7)
    xs = [rng.randint(80, 120) for _ in range(30)] + [
        rng.randint(180, 220) for _ in range(10)
    ]
    got = sorted(
        cusum_profile(_series_df(spark, xs), "series", "day", "x").collect(),
        key=lambda r: r.day,
    )
    ref = _cusum_ref(xs)
    assert [(r.cusum_pos, r.cusum_neg, r.alarm) for r in got] == ref
    # the level shift must actually alarm
    assert any(r.alarm for r in got)


def test_holt_is_bit_exact_vs_python(spark):
    """alpha=beta=0.5 makes every step IEEE-exact: the Spark doubles
    equal the Python recursion with ZERO tolerance."""
    from magi_etl_spark.operators.changepoint import holt_smooth

    from decimal import ROUND_HALF_UP, Decimal

    def half_up(v: float, dp: int = 12) -> float:
        # Spark's round is HALF_UP; Python's is banker's — and dyadic
        # values DO land exactly on decimal half-boundaries (they have
        # finite decimal expansions), so the reference must match
        # Spark's convention, not Python's.
        return float(
            Decimal(repr(v)).quantize(Decimal(f"1e-{dp}"), ROUND_HALF_UP)
        )

    xs = [103, 97, 111, 120, 95, 88, 130, 142, 77, 104]
    got = sorted(
        holt_smooth(
            _series_df(spark, xs), "series", "day", "x", round_dp=12
        ).collect(),
        key=lambda r: r.day,
    )
    level = trend = None
    for r, x in zip(got, xs):
        if level is None:
            level, trend = float(x), 0.0
        else:
            prev = level
            level = 0.5 * x + 0.5 * (level + trend)
            trend = 0.5 * (level - prev) + 0.5 * trend
        assert r.level == half_up(level) and r.trend == half_up(trend)


# --- mlprep ------------------------------------------------------------------


def test_quota_allocation_sums_exactly_and_is_proportional(spark):
    from magi_etl_spark.operators.mlprep import quota_allocate

    rows = (
        [("a",)] * 57 + [("b",)] * 29 + [("c",)] * 11 + [("d",)] * 3
    )
    df = spark.createDataFrame(rows, "s string")
    q = {r.s: r.quota for r in quota_allocate(df, ["s"], 17).collect()}
    assert sum(q.values()) == 17
    n = {"a": 57, "b": 29, "c": 11, "d": 3}
    total = sum(n.values())
    for s, quota in q.items():
        assert quota in (n[s] * 17 // total, n[s] * 17 // total + 1)


def test_quota_sample_returns_exactly_n_and_respects_quotas(spark, sf_dir):
    from magi_etl_spark.operators.mlprep import quota_allocate, quota_sample
    from magi_etl_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source"
    )
    out = quota_sample(docs, ["lang", "source"], "doc_id", 123)
    got = out.groupBy("lang", "source").count().collect()
    assert sum(r["count"] for r in got) == 123
    quotas = {
        (r.lang, r.source): r.quota
        for r in quota_allocate(docs, ["lang", "source"], 123).collect()
    }
    for r in got:
        assert r["count"] == quotas[(r.lang, r.source)]
    # determinism under repartition
    again = quota_sample(
        docs.repartition(13), ["lang", "source"], "doc_id", 123
    )
    assert {r.doc_id for r in out.collect()} == {
        r.doc_id for r in again.collect()
    }


def test_target_encoding_excludes_own_fold(spark):
    """Hand-checkable: two categories, labels arranged so the own-fold
    exclusion is visible."""
    from magi_etl_spark.operators.mlprep import (
        md5_fold,
        target_encode_kfold,
    )

    rows = [(i, "cat", 1 if i % 2 == 0 else 0) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, category string, y int")
    enc = target_encode_kfold(
        df, "category", F.col("y"), F.col("id"), n_folds=4, prior_weight=0
    ).collect()
    folds = {
        r.id: r.f
        for r in df.select(
            "id", md5_fold(F.col("id"), 4).alias("f")
        ).collect()
    }
    for row in enc:
        outside = [
            (1 if i % 2 == 0 else 0)
            for i in range(200)
            if folds[i] != row.fold
        ]
        assert row.n_out == len(outside)
        assert row.encoded == pytest.approx(
            sum(outside) / len(outside), abs=1e-6
        )


# --- inequality --------------------------------------------------------------


def test_gini_extremes(spark):
    from magi_etl_spark.operators.inequality import gini_by_group

    equal = spark.createDataFrame(
        [("g", i, 10) for i in range(8)], "g string, e long, m long"
    )
    out = gini_by_group(equal, ["g"], "e", F.col("m")).collect()[0]
    assert out.gini == 0.0
    concentrated = spark.createDataFrame(
        [("g", i, 0) for i in range(7)] + [("g", 99, 1000)],
        "g string, e long, m long",
    )
    out = gini_by_group(concentrated, ["g"], "e", F.col("m")).collect()[0]
    # all mass on one of n=8 entities -> gini = (n-1)/n
    assert out.gini == pytest.approx(7 / 8, abs=1e-9)


# --- engagement --------------------------------------------------------------


def test_rolling_active_users_ordering_invariant(spark, sf_dir):
    from magi_etl_spark.operators.engagement import rolling_active_users
    from magi_etl_spark.tables import load_table

    out = rolling_active_users(load_table(spark, sf_dir, "events")).collect()
    assert out
    for r in out:
        assert r.dau <= r.wau <= r.mau


def test_concurrency_profile_hand_fixture(spark):
    """Three users on one day: intervals [0,10:00:05], [10:00:02,
    10:00:08], [10:00:30, 10:00:30] -> peak 2 in the 10:00 hour."""
    from magi_etl_spark.operators.engagement import concurrency_profile

    rows = [
        (1, "2025-01-01 10:00:00"),
        (1, "2025-01-01 10:00:05"),
        (2, "2025-01-01 10:00:02"),
        (2, "2025-01-01 10:00:08"),
        (3, "2025-01-01 10:00:30"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts_s string").select(
        "user_id", F.to_timestamp("ts_s").alias("ts")
    )
    out = concurrency_profile(df).collect()
    assert len(out) == 1
    assert out[0].peak_concurrency == 2
    assert out[0].session_starts == 3


def test_decay_scores_hand_fixture(spark):
    from magi_etl_spark.operators.engagement import decay_engagement_scores

    rows = [
        (1, "2025-01-03 01:00:00", 10.0),
        (1, "2025-01-01 01:00:00", 10.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts_s string, value double"
    ).select("user_id", F.to_timestamp("ts_s").alias("ts"), "value")
    out = decay_engagement_scores(df).collect()[0]
    assert out.decay_score == pytest.approx(10 + 10 * 0.97**2, abs=1e-4)


# --- dimension as-of join ----------------------------------------------------


def test_asof_join_same_day_reversion_and_prehistory(spark):
    from magi_etl_spark.operators.dimjoin import asof_dimension_join

    dim = spark.createDataFrame(
        [
            (1, "2025-01-01", 10, "OLD"),
            (1, "2025-01-05", 11, "MID"),
            (1, "2025-01-05", 12, "NEW"),  # same-day re-version
        ],
        "custkey long, vf_s string, version_key long, priority string",
    ).select(
        "custkey",
        F.to_timestamp("vf_s").alias("valid_from"),
        "version_key",
        "priority",
    )
    facts = spark.createDataFrame(
        [
            (100, 1, "2025-01-06"),
            (101, 1, "2025-01-03"),
            (102, 1, "2024-12-30"),  # before every version
        ],
        "fid long, custkey long, t_s string",
    ).select("fid", "custkey", F.to_timestamp("t_s").alias("t"))
    out = {
        r.fid: r.asof_priority
        for r in asof_dimension_join(
            facts, dim, key="custkey", fact_time="t"
        ).collect()
    }
    assert out == {100: "NEW", 101: "OLD", 102: None}


# --- k-core ------------------------------------------------------------------


def test_kcore_fixture_and_fixpoint(spark):
    """K4 plus a pendant chain: the 3-core is exactly the K4, and the
    result is a fixpoint (every kept vertex has in-core degree >= 3)."""
    from magi_etl_spark.operators.kcore import k_core, undirected_edges

    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    chain = [(3, 10), (10, 11), (11, 12)]
    df = spark.createDataFrame(k4 + chain, "a long, b long")
    edges = undirected_edges(df, "a", "b")
    out = {r.vertex: r.degree for r in k_core(edges, k=3).collect()}
    assert set(out) == {0, 1, 2, 3}
    assert all(d == 3 for d in out.values())


def test_kcore_oracle_matches_spark_on_fixture(spark):
    import duckdb

    from magi_etl_spark.operators.kcore import (
        k_core,
        kcore_oracle_sql,
        undirected_edges,
    )

    edges_rows = [
        (a, b) for a in range(5) for b in range(5) if a < b
    ] + [(4, 20), (20, 21)]
    df = spark.createDataFrame(edges_rows, "a long, b long")
    got = {
        (r.vertex, r.degree)
        for r in k_core(undirected_edges(df, "a", "b"), k=3).collect()
    }
    values = ", ".join(f"({a}, {b})" for a, b in edges_rows)
    sql = kcore_oracle_sql(
        f"SELECT DISTINCT LEAST(a, b) AS a, GREATEST(a, b) AS b "
        f"FROM (VALUES {values}) AS t(a, b) WHERE a <> b",
        k=3,
    )
    want = {tuple(r) for r in duckdb.sql(sql).fetchall()}
    assert got == want


# --- text signals ------------------------------------------------------------


def test_script_profile_counts(spark):
    from magi_etl_spark.operators.textsignals import script_profile

    docs = spark.createDataFrame(
        [(1, "Ab1 Ã©café �!")],
        "doc_id long, text string",
    )
    r = script_profile(docs).collect()[0]
    assert r.n_ascii_alpha == 5  # A b c a f
    assert r.n_digit == 1
    assert r.n_replacement == 1
    assert r.n_mojibake_marker == 1
    assert r.n_non_ascii == 4  # Ã © é + replacement char


def test_extractive_summary_scores(spark):
    from magi_etl_spark.operators.textsignals import extractive_summary

    text = "cat cat cat. dog dog. cat dog. bird"
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = sorted(
        extractive_summary(docs, top_n=2).collect(), key=lambda r: r.sent_pos
    )
    # tf: cat=4, dog=3, bird=1
    # s0 = 3*4 = 12; s1 = 2*3 = 6; s2 = 4+3 = 7; s3 = 1
    assert [(r.sent_pos, r.score) for r in out] == [(0, 12), (2, 7)]
