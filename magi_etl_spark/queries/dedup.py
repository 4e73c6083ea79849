"""Deduplication query inventory (exact + MinHash/LSH + n-gram Jaccard)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from magi_etl_spark.operators import dedup as D
from magi_etl_spark.queries import query
from magi_etl_spark.tables import load_table

# Distinct word-3-gram shingle sets, shared by the oracle CTEs below.
_SHINGLES = r"""
    t AS (SELECT doc_id, list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '')
                     AS toks
          FROM documents),
    s AS (SELECT doc_id,
                 list_distinct(CASE WHEN len(toks) >= 3
                      THEN list_transform(range(1, len(toks) - 1),
                           i -> concat(toks[i], ' ', toks[i+1], ' ', toks[i+2]))
                      ELSE CAST([] AS VARCHAR[]) END) AS sh
          FROM t)
"""


@query(
    "q23_dedup_exact",
    oracle="""
    SELECT user_id, event_type, props,
           COUNT(*) AS n_copies,
           MIN(event_id) AS kept_event_id
    FROM events
    GROUP BY user_id, event_type, props
    HAVING COUNT(*) > 1
    """,
)
def q23_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate-group detection via hash group-by: one shuffle,
    map-side combined; the survivor row is the min id."""
    e = load_table(spark, sf_dir, "events")
    return D.exact_duplicate_groups(e, ["user_id", "event_type", "props"], "event_id")


@query(
    "q47_dedup_keep_best",
    oracle="""
    SELECT user_id, event_type, props, event_id AS kept_event_id,
           CAST(ROUND(value * 100) AS BIGINT) AS kept_value_c
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY user_id, event_type, props
            ORDER BY value DESC NULLS LAST, event_id) AS rn
        FROM events
    ) WHERE rn = 1
    """,
)
def q47_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-best duplicate resolution: one survivor per duplicate key
    group, chosen by quality (here: max value) instead of arbitrary —
    the corpus-dedup policy that preserves the best copy."""
    e = load_table(spark, sf_dir, "events")
    kept = D.dedup_keep_best(e, ["user_id", "event_type", "props"], "value", "event_id")
    return kept.select(
        "user_id", "event_type", "props",
        F.col("event_id").alias("kept_event_id"),
        F.round(F.col("value") * 100).cast("long").alias("kept_value_c"),
    )


@query(
    "q24_minhash_signatures",
    oracle=f"""
    WITH {_SHINGLES}
    SELECT doc_id,
           list_min(list_transform(sh, x -> md5(concat('0|', x)))) AS m0,
           list_min(list_transform(sh, x -> md5(concat('1|', x)))) AS m1,
           list_min(list_transform(sh, x -> md5(concat('2|', x)))) AS m2,
           list_min(list_transform(sh, x -> md5(concat('3|', x)))) AS m3
    FROM s WHERE len(sh) > 0
    """,
)
def q24_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures (4 salted md5 min-hashes over word-3-gram
    shingles) — constant-size sketch per document."""
    d = load_table(spark, sf_dir, "documents")
    return D.minhash_signatures(d, "doc_id", "text", n=3, n_hashes=4)


@query(
    "q25_minhash_lsh_neardup",
    oracle=f"""
    WITH {_SHINGLES},
    sig AS (
        SELECT doc_id, sh,
               list_min(list_transform(sh, x -> md5(concat('0|', x)))) AS m0,
               list_min(list_transform(sh, x -> md5(concat('1|', x)))) AS m1,
               list_min(list_transform(sh, x -> md5(concat('2|', x)))) AS m2,
               list_min(list_transform(sh, x -> md5(concat('3|', x)))) AS m3
        FROM s WHERE len(sh) > 0
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM sig a JOIN sig b
          ON a.doc_id < b.doc_id
         AND (concat(a.m0, '|', a.m1) = concat(b.m0, '|', b.m1)
              OR concat(a.m2, '|', a.m3) = concat(b.m2, '|', b.m3))
    ),
    verified AS (
        SELECT c.doc_a, c.doc_b,
               len(list_intersect(sa.sh, sb.sh)) AS n_inter,
               len(sa.sh) AS n_a, len(sb.sh) AS n_b
        FROM cand c
        JOIN sig sa ON c.doc_a = sa.doc_id
        JOIN sig sb ON c.doc_b = sb.doc_id
    )
    SELECT doc_a, doc_b,
           ROUND(n_inter / (n_a + n_b - n_inter), 6) AS jaccard
    FROM verified
    WHERE n_inter / (n_a + n_b - n_inter) >= 0.5
    """,
)
def q25_minhash_lsh_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full MinHash→LSH→verify near-dup pipeline: banded signature join for
    candidates (2 bands × 2 hashes), exact Jaccard verification of
    candidates only — never an all-pairs product."""
    d = load_table(spark, sf_dir, "documents")
    return D.minhash_lsh_dedup(
        d, "doc_id", "text", n=3, n_hashes=4, band_size=2, threshold=0.5
    )


@query(
    "q29_ngram_jaccard_pairs",
    oracle=f"""
    WITH {_SHINGLES},
    nonempty AS (SELECT doc_id, sh FROM s WHERE len(sh) > 0),
    ex0 AS (SELECT doc_id, unnest(sh) AS shingle FROM nonempty),
    nd AS (SELECT COUNT(DISTINCT doc_id) AS n FROM ex0),
    rare AS (
        SELECT shingle FROM ex0, nd
        GROUP BY shingle, nd.n HAVING COUNT(*) <= 0.01 * nd.n
    ),
    ex AS (SELECT e.doc_id, e.shingle FROM ex0 e JOIN rare r ON e.shingle = r.shingle),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
        FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY doc_a, doc_b
    ),
    sized AS (
        SELECT i.doc_a, i.doc_b, i.n_inter, len(sa.sh) AS n_a, len(sb.sh) AS n_b
        FROM inter i
        JOIN nonempty sa ON i.doc_a = sa.doc_id
        JOIN nonempty sb ON i.doc_b = sb.doc_id
    )
    SELECT doc_a, doc_b, ROUND(n_inter / (n_a + n_b - n_inter), 6) AS jaccard
    FROM sized
    WHERE n_inter / (n_a + n_b - n_inter) >= 0.5
    """,
)
def q29_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram Jaccard near-dup pairs with stop-shingle pruning — the
    100TB-safe registration.  Shingles occurring in more than 1% of the
    corpus are dropped BEFORE the shingle-keyed self-join (the join's
    intermediate is Σ df², so stop-shingles are the quadratic term);
    union sizes still use full sets, so pruning only removes pairs held
    together by stop-shingles.  On this corpus the pruned result is
    IDENTICAL to the exact one (q50) — near-dups share rare shingles.
    """
    d = load_table(spark, sf_dir, "documents")
    return D.ngram_jaccard_pairs(
        d, "doc_id", "text", n=3, threshold=0.5, max_doc_freq=0.01
    )


@query(
    "q50_exact_ngram_jaccard_pairs",
    oracle=f"""
    WITH {_SHINGLES},
    nonempty AS (SELECT doc_id, sh FROM s WHERE len(sh) > 0),
    ex AS (SELECT doc_id, unnest(sh) AS shingle FROM nonempty),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
        FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY doc_a, doc_b
    ),
    sized AS (
        SELECT i.doc_a, i.doc_b, i.n_inter, len(sa.sh) AS n_a, len(sb.sh) AS n_b
        FROM inter i
        JOIN nonempty sa ON i.doc_a = sa.doc_id
        JOIN nonempty sb ON i.doc_b = sb.doc_id
    )
    SELECT doc_a, doc_b, ROUND(n_inter / (n_a + n_b - n_inter), 6) AS jaccard
    FROM sized
    WHERE n_inter / (n_a + n_b - n_inter) >= 0.5
    """,
)
def q50_exact_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT (unpruned) n-gram Jaccard pairs — small-N parity form only.
    The unpruned shingle self-join is quadratic in posting-list length and
    must not be run on a large corpus; use q29 (pruned) at scale."""
    d = load_table(spark, sf_dir, "documents")
    return D.ngram_jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.5)


@query(
    "q55_decontaminate",
    oracle=f"""
    WITH {_SHINGLES},
    bt AS (SELECT doc_id AS bench_id, toks[1:10] AS btoks
           FROM t WHERE doc_id % 89 = 0 AND len(toks) >= 10),
    b AS (SELECT bench_id,
                 list_distinct(list_transform(range(1, len(btoks) - 1),
                      i -> concat(btoks[i], ' ', btoks[i+1], ' ', btoks[i+2])))
                     AS bsh
          FROM bt),
    pairs AS (
        SELECT s.doc_id, b.bench_id,
               len(list_intersect(s.sh, b.bsh)) AS overlap,
               len(b.bsh) AS bench_shingles
        FROM s, b
        WHERE len(s.sh) > 0 AND len(b.bsh) > 0
    )
    SELECT doc_id, bench_id, overlap, bench_shingles,
           CAST(ROUND(overlap * 1000.0 / bench_shingles) AS BIGINT)
               AS containment_permille
    FROM pairs
    WHERE overlap >= bench_shingles * 0.8
    """,
)
def q55_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag documents containing >= 80% of a
    benchmark item's distinct word-3-grams.  The benchmark set is carved
    deterministically from the corpus (first 10 tokens of every 89th doc
    — the planted-leak scenario), so every bench item flags at least its
    own source document.

    Scale shape: the small benchmark side explodes and BROADCASTS; the
    corpus is one linear scan + a candidate-only aggregation (see
    operators/decontaminate.py)."""
    from magi_etl_spark.functions.text import tokens
    from magi_etl_spark.operators.decontaminate import contamination_pairs

    d = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    bench = d.where((F.col("doc_id") % 89 == 0) & (F.size(toks) >= 10)).select(
        F.col("doc_id").alias("bench_id"),
        F.array_join(F.slice(toks, 1, 10), " ").alias("text"),
    )
    pairs = contamination_pairs(
        d, bench, bench_id="bench_id", n=3, threshold=0.8
    )
    return pairs.select(
        "doc_id", "bench_id", "overlap", "bench_shingles",
        F.round(F.col("containment") * 1000).cast("long").alias(
            "containment_permille"
        ),
    )


@query(
    "q59_dedup_clusters",
    oracle=f"""
    WITH RECURSIVE {_SHINGLES},
    sig AS (
        SELECT doc_id, sh,
               list_min(list_transform(sh, x -> md5(concat('0|', x)))) AS m0,
               list_min(list_transform(sh, x -> md5(concat('1|', x)))) AS m1,
               list_min(list_transform(sh, x -> md5(concat('2|', x)))) AS m2,
               list_min(list_transform(sh, x -> md5(concat('3|', x)))) AS m3
        FROM s WHERE len(sh) > 0
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM sig a JOIN sig b
          ON a.doc_id < b.doc_id
         AND (concat(a.m0, '|', a.m1) = concat(b.m0, '|', b.m1)
              OR concat(a.m2, '|', a.m3) = concat(b.m2, '|', b.m3))
    ),
    verified AS (
        SELECT c.doc_a, c.doc_b,
               len(list_intersect(sa.sh, sb.sh)) AS n_inter,
               len(sa.sh) AS n_a, len(sb.sh) AS n_b
        FROM cand c
        JOIN sig sa ON c.doc_a = sa.doc_id
        JOIN sig sb ON c.doc_b = sb.doc_id
    ),
    pairs AS (
        SELECT doc_a, doc_b FROM verified
        WHERE n_inter / (n_a + n_b - n_inter) >= 0.5
    ),
    sym AS (
        SELECT doc_a AS v, doc_b AS n FROM pairs
        UNION ALL
        SELECT doc_b AS v, doc_a AS n FROM pairs
    ),
    walk AS (
        SELECT v, n AS reach FROM sym
        UNION
        SELECT w.v, s.n FROM walk w JOIN sym s ON w.reach = s.v
    )
    SELECT v AS vertex, LEAST(v, MIN(reach)) AS component
    FROM walk GROUP BY v
    """,
)
def q59_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS from the q25 MinHash-LSH pairs: connected
    components by iterative min-label propagation, component id = min
    doc_id reachable.  Pairs alone under-deduplicate (A~B, B~C leaves
    two copies of one family); components give the survivor-per-cluster
    policy.  The DuckDB oracle computes the same closure with a
    recursive CTE, verifying every (vertex, component) assignment."""
    from magi_etl_spark.operators.components import connected_components

    d = load_table(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_dedup(
        d, "doc_id", "text", n=3, n_hashes=4, band_size=2, threshold=0.5
    ).select("doc_a", "doc_b")
    return connected_components(pairs)
