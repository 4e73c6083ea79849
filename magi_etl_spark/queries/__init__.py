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

# r10 rotation (COVERAGE.md "Planned r10 window"): CORRECTNESS_r09 came
# back 50/50 green, so the r9 wave (EXT6, q226-q231) merges and the
# staged backlog stays drained.
R9_QUEUE: frozenset[str] = frozenset()


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
    # r5 rotation: the r4 staged registry (q95-q113, oracle-verified all
    # through r4 by tests/test_extension_queries.py) merges into the main
    # registry verbatim — COVERAGE.md "Planned r5 window", rotation rule 1.
    from magi_etl_spark.queries.extensions import EXT_ORACLE, EXT_QUERIES

    dup = set(EXT_QUERIES) & set(QUERIES)
    if dup:
        raise RuntimeError(f"extension queries shadow registered ones: {dup}")
    QUERIES.update(EXT_QUERIES)
    ORACLE.update(EXT_ORACLE)
    # r6 rotation: the r5 staged registry (q117-q132, oracle-verified all
    # through r5 by tests/test_extensions_r5.py) merges the same way —
    # COVERAGE.md "Planned r6 window", rotation rule 1.
    from magi_etl_spark.queries.extensions_r5 import EXT2_ORACLE, EXT2_QUERIES

    dup2 = set(EXT2_QUERIES) & set(QUERIES)
    if dup2:
        raise RuntimeError(f"r5 extension queries shadow registered ones: {dup2}")
    QUERIES.update(EXT2_QUERIES)
    ORACLE.update(EXT2_ORACLE)
    # r8 rotation (COVERAGE.md "Planned r8 window", scenario 1 — the r6
    # driver artifacts never arrived and the r7 gate re-ran the r6 window
    # green): rule 1 front-loads the FIRST never-driver-verified staged
    # entries in registration order.  The q122 failure re-entry takes one
    # window slot, so 49 staged entries merge (q133-q181); the last two
    # EXT3 entries (q182/q183) stay staged and lead the r9 queue together
    # with the r7 wave (EXT4, q184-q219).
    from magi_etl_spark.queries.extensions_r6 import EXT3_ORACLE, EXT3_QUERIES

    merged_r6 = [n for n in EXT3_QUERIES if n not in R9_QUEUE]
    dup3 = set(merged_r6) & set(QUERIES)
    if dup3:
        raise RuntimeError(f"r6 extension queries shadow registered ones: {dup3}")
    for n in merged_r6:
        QUERIES[n] = EXT3_QUERIES[n]
        ORACLE[n] = EXT3_ORACLE[n]
    # r9 rotation: the r7 wave (EXT4, q184-q219, oracle-verified all through
    # r7/r8 by tests/test_extensions_r7.py) and the r8 wave (EXT5,
    # q220-q225, tests/test_extensions_r8.py) merge the same way —
    # COVERAGE.md "Planned r9 window", rotation rule 1.
    from magi_etl_spark.queries.extensions_r7 import EXT4_ORACLE, EXT4_QUERIES
    from magi_etl_spark.queries.extensions_r8 import EXT5_ORACLE, EXT5_QUERIES

    # r10 rotation: the r9 wave (EXT6, q226-q231, oracle-verified all
    # through r9 by tests/test_extensions_r9.py) merges the same way —
    # COVERAGE.md "Planned r10 window", rotation rule 1.
    from magi_etl_spark.queries.extensions_r9 import EXT6_ORACLE, EXT6_QUERIES

    # r11 rotation: the r10 wave (EXT7, q232-q237, oracle-verified all
    # through r10 by tests/test_extensions_r10.py) merges the same way —
    # COVERAGE.md "Planned r11 window", rotation rule 1.
    from magi_etl_spark.queries.extensions_r10 import EXT7_ORACLE, EXT7_QUERIES

    for tag, (q, o) in {
        "r7": (EXT4_QUERIES, EXT4_ORACLE),
        "r8": (EXT5_QUERIES, EXT5_ORACLE),
        "r9": (EXT6_QUERIES, EXT6_ORACLE),
        "r10": (EXT7_QUERIES, EXT7_ORACLE),
    }.items():
        dup = set(q) & set(QUERIES)
        if dup:
            raise RuntimeError(
                f"{tag} extension queries shadow registered ones: {dup}"
            )
        QUERIES.update(q)
        ORACLE.update(o)


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
    # ROUND-11 WINDOW — COVERAGE.md "Planned r11 window".  CORRECTNESS_r10
    # was 50/50 green (no failure re-entries), so rule 1 front-loads the
    # r10 staged wave (EXT7, q232-q237) in registration order — the staged
    # backlog stays at ZERO.
    "q232_cuped_adjustment",
    "q233_exact_quantiles",
    "q234_boolean_retrieval",
    "q235_ks_drift",
    "q236_logrank_churn",
    "q237_ratio_metric_ci",
    # Dependency re-entries (rule 2, machine-checked by
    # tests/test_gate_window.py): the r11-session ADVICE fixes touch
    # operators/skipping.py (offset-zone session ids), re-flagging its two
    # tail dependents, and the session's proactive hardening sweep fixed
    # the same two defect classes latent in operators/wquantile.py (null
    # CDF ordering + BIGINT threshold product), re-flagging q228.  The
    # selection.py/kstest.py ADVICE fixes re-flag only q233/q235, already
    # at the window front as the EXT7 merge.
    "q200_data_skipping",
    "q201_dynamic_partition_pruning",
    "q228_weighted_median",
    # Oldest-verified-first tail refresh (rule 1 fill, 41 slots, computed
    # from the union of CORRECTNESS rows at r10 close; ties in
    # registration order): the r4-era rows — q93/q94 finally land, two
    # rounds after their first displacement — then the r5-era rows.  The
    # three re-entry slots above displace q95/q96/q97 to the r12 fill.
    "q51_exact_token_cosine_pairs",
    "q60_quantize_embeddings",
    "q87_scd2_intervals",
    "q88_bm25_topk",
    "q90_profile_table",
    "q92_cdc_apply",
    "q93_scd2_snapshot",
    "q94_token_budget_select",
    "q48_market_share",
    "q52_min_cost_supplier",
    "q53_dominant_supplier",
    "q58_blame_supplier",
    "q66_asof_join",
    "q78_key_skew_profile",
    "q80_bucketed_colocated_join",
    "q85_zorder_pruned_scan",
    "q63_vocab_coverage",
    "q65_normalize_text",
    "q82_grouping_sets",
    "q54_helix_generic",
    "q79_concurrent_fanout",
    "q02_filter_project",
    "q07_anti_join",
    "q15_having_threshold",
    "q16_set_ops",
    "q17_minmax_normalize",
    "q45_nation_pair_volume",
    "q62_top_supplier",
    "q67_range_join",
    "q68_hypertable_rollup",
    "q71_small_order_parts",
    "q72_large_volume_customers",
    "q73_table_diff",
    "q74_daily_anomalies",
    "q75_funnel",
    "q76_retention_cohorts",
    "q83_event_gaps",
    "q81_bloom_pruned_join",
    "q49_chunking",
    "q61_corpus_percentiles",
    "q70_pii_scan",
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
