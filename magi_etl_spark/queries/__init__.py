"""Driver-facing query inventory.

Each entry pairs a Spark DataFrame program (idiomatic, Catalyst-optimized)
with an ANSI-SQL oracle that DuckDB runs over the same parquet tables.
Column names are aligned on both sides — the driver sorts columns by name
and hashes values, so every computed column is aliased identically.

Determinism rules used throughout (see SURVEY.md §5.2):
- Monetary sums are reported as exact integers (``round(x * 10^k)`` summed
  as bigint) so floating-point summation order can never flip a hash.
- LIMIT/top-k queries always carry a unique tie-break key.
- Timestamps are never emitted raw (parquet ns vs Spark micro precision);
  they are floored to seconds/days or diffed into integers.
- Float outputs are either per-row deterministic expressions or rounded
  well inside the driver's 6-dp comparison grid.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query; ``oracle`` is the DuckDB-equivalent SQL (omit for
    non-SQL-expressible operators — the driver then runs a rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def _load_all() -> None:
    from magi_etl_spark.queries import (  # noqa: F401
        advanced,
        dedup,
        engine,
        etl,
        relational,
        similarity,
        text,
    )


_load_all()


# --- driver-gate ordering -------------------------------------------------
# The external correctness gate oracle-checks the FIRST 50 entries of
# ``__spark_entry__.queries()`` in registration order, so dict order here
# IS the verification schedule.  The window below front-loads queries that
# have never had a driver row (new operators, reworked plans), then the
# load-bearing engine surface; the tail holds queries already verified in
# a previous round's gate.  The rotation across rounds is recorded in
# COVERAGE.md — every registered query must land inside the window at
# least once, and every query (window or tail) stays covered continuously
# by the local DuckDB-oracle suite (tests/test_queries_oracle.py).
GATE_WINDOW = 50

_PRIORITY: list[str] = [
    # Round-4 window: the full 32-query r3 tail, front-loaded exactly as
    # pre-committed in COVERAGE.md ("Planned r4 window").  All 32 were
    # green in the r2 gate and stayed local-oracle-green through r3; this
    # gives them a current-cycle external driver row.
    "q32_simhash",
    "q43_simhash_neardup",
    "q33_kv_parse",
    "q34_date_functions",
    "q35_vector_stats",
    "q36_rollup",
    "q37_pivot",
    "q38_srp_lsh_buckets",
    "q39_token_cosine_pairs",
    "q51_exact_token_cosine_pairs",
    "q42_window_benchmark",
    "q40_corpus_pipeline",
    "q60_quantize_embeddings",
    "q23_dedup_exact",
    "q47_dedup_keep_best",
    "q24_minhash_signatures",
    "q25_minhash_lsh_neardup",
    "q29_ngram_jaccard_pairs",
    "q50_exact_ngram_jaccard_pairs",
    "q55_decontaminate",
    "q59_dedup_clusters",
    "q48_market_share",
    "q46_above_avg_customers",
    "q52_min_cost_supplier",
    "q53_dominant_supplier",
    "q58_blame_supplier",
    "q66_asof_join",
    # operators/text.py gained the persisted-token-array rework in r4
    # (quality_scores CSE fix), so every text-family tail query the
    # dependency map flags re-enters — displacing five r2-green,
    # unchanged relational entries (q02 q15 q16 q17 q45) back to the
    # tail: rotation rule 2 (changed sources) outranks rule 3 (oldest
    # rotation)
    "q20_token_stats",
    "q21_quality_scores",
    "q22_language_id",
    "q26_fingerprints",
    "q65_normalize_text",
    # new this round
    "q85_zorder_pruned_scan",
    "q86_ivf_kmeans_topk",
    "q87_scd2_intervals",
    "q88_bm25_topk",
    "q89_rolling_7d",
    "q90_profile_table",
    "q91_gapfill_interpolate",
    "q92_cdc_apply",
    "q93_scd2_snapshot",
    "q94_token_budget_select",
    # dependency re-entries: tail queries whose transitive sources
    # (operators/similarity.py, functions/__init__.py) changed this
    # round — flagged by tests/test_gate_window.py's dependency map
    # (VERDICT r3 item 2), so their r3 rows no longer certify HEAD
    "q41_ivf_topk",
    "q27_embedding_topk",
    "q28_embedding_neardup",
    "q44_lsh_blocked_embedding_dedup",
    "q78_key_skew_profile",
    "q63_vocab_coverage",
    "q69_repetition_score",
    # q80 re-enters because sinks.py (write_bucketed's module) gained
    # write_partitioned this round — behavior unchanged, but the
    # dependency map works at file granularity and the honest response
    # to a flagged dependency is an external re-verify, not an exemption.
    # It takes the slot q54 held (q54: r3-green, sources unchanged —
    # rotates to the tail with the rest of the engine surface; the
    # window has no discretionary slots left this round).
    "q80_bucketed_colocated_join",
]


def _reorder() -> None:
    snapshot = dict(QUERIES)
    missing = [n for n in _PRIORITY if n not in snapshot]
    if missing:
        raise RuntimeError(f"priority list names unknown queries: {missing}")
    QUERIES.clear()
    for n in _PRIORITY:
        QUERIES[n] = snapshot[n]
    for n in snapshot:
        if n not in QUERIES:
            QUERIES[n] = snapshot[n]


_reorder()
