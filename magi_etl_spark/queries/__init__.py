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
    # never driver-verified before this round (18)
    "q41_ivf_topk",
    "q56_dataset_mix",
    "q57_sequence_packing",
    "q61_corpus_percentiles",
    "q63_vocab_coverage",
    "q64_stratified_sample",
    "q65_normalize_text",
    "q67_range_join",
    "q68_hypertable_rollup",
    "q69_repetition_score",
    "q70_pii_scan",
    "q71_small_order_parts",
    "q72_large_volume_customers",
    "q73_table_diff",
    "q74_daily_anomalies",
    "q75_funnel",
    "q76_retention_cohorts",
    "q78_key_skew_profile",
    # new this round (6)
    "q79_concurrent_fanout",
    "q80_bucketed_colocated_join",
    "q81_bloom_pruned_join",
    "q82_grouping_sets",
    "q83_event_gaps",
    "q84_dataset_split",
    # green in round 1 only — re-verify at the driver (8)
    "q20_token_stats",
    "q21_quality_scores",
    "q22_language_id",
    "q26_fingerprints",
    "q27_embedding_topk",
    "q28_embedding_neardup",
    "q44_lsh_blocked_embedding_dedup",
    "q49_chunking",
    # reworked plan this round — re-verify at the driver (1)
    "q62_top_supplier",
    # load-bearing engine + core relational surface (17; q66/q17/q16/q15
    # rotated to the tail — all r2-green — making room for q81-q84)
    "q30_metric_query_events",
    "q31_metric_query_unnest",
    "q54_helix_generic",
    "q77_cached_metric_query",
    "q01_pricing_summary",
    "q03_top_orders",
    "q05_region_revenue",
    "q06_semi_join",
    "q07_anti_join",
    "q08_full_outer_cast_keys",
    "q09_top1_per_group",
    "q10_topk_per_group",
    "q11_sessionize",
    "q12_conditional_agg",
    "q13_distinct_derived_key",
    "q14_json_extract",
    "q18_week_buckets",
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
