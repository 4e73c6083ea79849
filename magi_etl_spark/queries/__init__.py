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
    # ROUND 7 NOTE: this is still the round-6 window, DELIBERATELY.
    # The r6 driver artifacts (CORRECTNESS_r06/BENCH_r06/r6 VERDICT)
    # were never delivered to the repo, so on disk q117-q132 and the
    # r6 re-entries remain "never driver-verified" — rotating them out
    # would violate the rotation rules and the gate-window invariant
    # test (the round-2 silent-unverification mistake).  The r7 gate
    # therefore re-runs the r6 window (its rows double as the missing
    # verification), the r7 operator wave stages in
    # queries/extensions_r7.py (q184+, hash-oracle-swept every suite
    # run), and COVERAGE.md "Planned r8 window" pre-commits both
    # rotation scenarios.
    #
    # Round-6 window, exactly as pre-committed in COVERAGE.md ("Planned
    # r6 window").  Rule 1: the sixteen staged r5 operator-extension
    # queries (merged from queries/extensions_r5.py, oracle-verified
    # every suite run through r5) have never had a driver row and go
    # first.
    "q117_bpe_merges",
    "q118_bpe_segment",
    "q119_bigram_logprob",
    "q120_top_ngrams",
    "q121_oot_split",
    "q122_bpe_encode_docs",
    "q123_multimodal_features",
    "q124_audio_features",
    "q125_enrich_summary",
    "q126_enrich_poster",
    "q127_dsir_importance",
    "q128_ngram_novelty",
    "q129_duplicated_spans",
    "q130_merge_into",
    "q131_weighted_sample",
    "q132_tokenize_and_pack",
    # The one red cell of r5: q89's gate row failed on the oracle's
    # uncast HUGEINT value_c column (DuckDB SUM(BIGINT) → int128 →
    # float64 under the driver's typed fetch; the r5 avg/frame rework
    # never touched that channel).  The outer SELECT now casts it to
    # BIGINT and a repo-wide no-HUGEINT oracle lint guards the class
    # (tests/test_oracle_types.py).  Failure rule: q89 stays in the
    # window until a green driver row lands.
    "q89_rolling_7d",
    # Rule 2: q104/q106 were rows-only in r5 ("no_oracle" driver rows —
    # not a green hash row) and both gained full hash oracles this round
    # (r5 VERDICT item 6: recursive-CTE reachability for the SemDeDup
    # component fixpoint; hash-init codebooks make the whole PQ path
    # relational).  New oracle ⇒ back into the window.
    "q104_semantic_dedup",
    "q106_pq_refine_topk",
    # Rule 2 (dependency re-entry): operators/lsh_index.py changed this
    # round (r5 ADVICE items 2/3 — checkpoint-not-persist + idempotent
    # per-batch increment appends), so q114's r5-green row no longer
    # covers its sources; the gate-window dependency test flags it back
    # into the window.
    "q114_incremental_lsh_index",
    # Rule 2 (dependency re-entries, flagged mid-round by
    # tests/test_gate_window.py): the round-6 operator wave APPENDED to
    # operators/{dedup,similarity,mixing,stats,graph}.py (containment
    # pairs, hard negatives, curriculum ordering, OLS/Wilson/AB stats,
    # triangle counting), so every tail query transitively importing
    # those modules lost source-coverage for its last green driver row
    # and must re-enter the window — additions, not edits, but the
    # file-granular dependency rule doesn't (and shouldn't) distinguish.
    "q24_minhash_signatures",
    "q25_minhash_lsh_neardup",
    "q27_embedding_topk",
    "q28_embedding_neardup",
    "q29_ngram_jaccard_pairs",
    "q41_ivf_topk",
    "q44_lsh_blocked_embedding_dedup",
    "q50_exact_ngram_jaccard_pairs",
    "q55_decontaminate",
    "q56_dataset_mix",
    "q59_dedup_clusters",
    "q64_stratified_sample",
    "q69_repetition_score",
    "q84_dataset_split",
    "q86_ivf_kmeans_topk",
    "q98_rrf_fusion",
    "q99_temperature_mix",
    "q103_winsorize",
    "q107_join_estimate",
    "q108_group_sample_n",
    "q112_semantic_decontaminate",
    "q113_corpus_curation",
    "q115_incremental_ivf_index",
    "q116_pagerank",
    "q23_dedup_exact",
    "q47_dedup_keep_best",
    "q38_srp_lsh_buckets",
    # dow_seasonal_index landed in operators/timeseries.py late in the
    # round, flagging its importers: q89 was already in the window, q91
    # re-enters here
    "q91_gapfill_interpolate",
    # Remaining slots (rule 3): the r5 tail, oldest-verified first —
    # engine-surface entries last gate-verified in r3.  The rest of the
    # planned tail fill (q05 onward) rotates to r7, displaced by the 28
    # dependency re-entries above; all remain covered every round by
    # the local DuckDB-oracle sweep and the sf0.01 driver-contract
    # probe.
    "q01_pricing_summary",
    "q03_top_orders",
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
