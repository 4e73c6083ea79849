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

# r9 rotation (COVERAGE.md "Planned r9 window"): CORRECTNESS_r08 came back
# 50/50 green, so the displaced EXT3 residue (q182/q183) merges now along
# with the full r7 wave (EXT4, q184-q219) and r8 wave (EXT5, q220-q225) —
# draining the staged backlog to ZERO for the first time since round 5.
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

    for tag, (q, o) in {
        "r7": (EXT4_QUERIES, EXT4_ORACLE),
        "r8": (EXT5_QUERIES, EXT5_ORACLE),
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
    # ROUND-9 WINDOW — COVERAGE.md "Planned r9 window".  CORRECTNESS_r08
    # was 50/50 green (no failure re-entries), so rule 1 front-loads ALL
    # 44 remaining never-driver-verified entries in registration order:
    # the displaced EXT3 residue (q182/q183), the r7 wave (EXT4,
    # q184-q219, 36 entries), and the r8 wave (EXT5, q220-q225, 6
    # entries).  This drains the staged backlog to ZERO — every
    # registered query has a driver row after this gate.
    "q182_multi_touch",
    "q183_markov_attribution",
    # EXT4 in registration order (declaration order in extensions_r7.py)
    "q184_active_user_stickiness",
    "q185_concurrency_peaks",
    "q187_decay_engagement",
    "q186_revenue_gini",
    "q188_target_encoding",
    "q189_woe_iv",
    "q190_quota_sample",
    "q191_cusum_alarms",
    "q192_holt_smoothing",
    "q193_winnow_profile",
    "q194_winnow_pairs",
    "q195_similarity_join",
    "q196_script_profile",
    "q197_extract_summary",
    "q198_asof_enrichment",
    "q199_kcore",
    "q200_data_skipping",
    "q201_dynamic_partition_pruning",
    "q202_lsh_candidate_eval",
    "q204_ivf_recall_eval",
    "q219_transition_entropy",
    "q218_source_datasheet",
    "q217_entry_exit_bounce",
    "q215_weighted_jaccard",
    "q216_token_pmi",
    "q214_conversion_latency",
    "q211_negative_edges",
    "q212_rendezvous_shards",
    "q213_twap",
    "q210_common_runs",
    "q207_ecdf_normalize",
    "q208_chi_square",
    "q209_survival_curve",
    "q206_langid_confusion",
    "q205_theil_sen_trend",
    "q203_lorenz_points",
    # EXT5 in registration order
    "q220_kcenter_coreset",
    "q221_label_propagation",
    "q222_good_turing",
    "q223_epoch_plan",
    "q224_feature_hashing",
    "q225_rare_bigram_band",
    # Dependency re-entries (rule 2, machine-checked by
    # tests/test_gate_window.py): the r9-session ADVICE fix touched
    # operators/behavior.py (docstring correction), which re-flags its
    # six tail dependents — they take the remaining slots, displacing
    # the planned oldest-first tail re-entries (q05 q06 q08 q09 q10
    # q11) to the r10 fill, exactly as prior rounds handled in-session
    # operator edits.
    "q139_funnel",
    "q140_cohort_retention",
    "q141_markov_transitions",
    "q146_rfm_segments",
    "q148_attribution",
    "q166_top_event_paths",
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
