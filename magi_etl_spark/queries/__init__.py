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

# EXT3 entries deliberately NOT merged at the r8 rotation: the q122 failure
# re-entry takes one of the 50 window slots, so only the first 49 staged
# entries fit (never-verified entries are interchangeable under rule 1,
# failures are not).  These two lead the r9 queue ahead of the r7 wave.
R9_QUEUE = frozenset({"q182_multi_touch", "q183_markov_attribution"})


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
    # ROUND-8 WINDOW — COVERAGE.md "Planned r8 window", scenario 1
    # (CORRECTNESS_r06 never arrived; the r7 gate re-ran the unchanged
    # r6 window and CORRECTNESS_r07 delivered its verification one round
    # late: 49 green rows, 1 err).
    #
    # Failure rule first: q122's r7 row was a driver err — the query
    # emitted the repo's only complex-typed output column (token_ids:
    # array<int>) and the driver's pandas canonicalization cannot hash
    # list cells.  Fixed this round (token_seq string + string_agg
    # oracle; class closed by tests/test_output_schemas.py's repo-wide
    # no-complex-output lint).  It stays in the window until a green
    # driver row lands.
    "q122_bpe_encode_docs",
    # Rule 1: the first FORTY-NINE never-driver-verified staged entries
    # in registration order — the r6 operator wave (merged from
    # queries/extensions_r6.py, hash-oracle + plan-lint green at every
    # suite run since they were authored).  q122's failure slot
    # displaces the LAST two staged entries (q182/q183 = R9_QUEUE),
    # which lead the r9 window together with the r7 wave (EXT4,
    # q184-q219, still staged in queries/extensions_r7.py).
    "q133_kmv_distinct",
    "q134_hll_distinct",
    "q135_cms_heavy_hitters",
    "q136_hard_negatives",
    "q137_containment_pairs",
    "q138_curriculum_order",
    "q139_funnel",
    "q140_cohort_retention",
    "q141_markov_transitions",
    "q142_copurchase_lift",
    "q143_psi_drift",
    "q144_mad_outliers",
    "q145_random_projection",
    "q146_rfm_segments",
    "q147_triangle_count",
    "q148_attribution",
    "q149_kmv_set_overlap",
    "q150_image_phash",
    "q151_image_near_dup",
    "q152_ols_trend",
    "q153_wilson_ci",
    "q154_ab_compare",
    "q155_benford_audit",
    "q156_mutual_information",
    "q157_revenue_concentration",
    "q158_dow_seasonality",
    "q159_corr_matrix",
    "q160_personalized_pagerank",
    "q161_fs_linkage",
    "q162_grid_quantiles",
    "q163_frequent_triples",
    "q164_kneser_ney",
    "q165_shard_plan",
    "q166_top_event_paths",
    "q167_phrase_search",
    "q168_seed_classifier",
    "q169_domain_curation",
    "q170_k_anonymity",
    "q171_soft_dedup_weights",
    "q172_golden_records",
    "q173_l_diversity",
    "q174_dp_noisy_counts",
    "q175_curation_manifest",
    "q176_tokenizer_fertility",
    "q177_score_calibration",
    "q178_span_removal",
    "q179_entity_resolution",
    "q180_readability",
    "q181_fk_discovery",
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
