"""STAGED r7 gate queries over the round-6 operator additions.

Same staging pattern the r4→r5 and r5→r6 rotations proved out: the r6
driver window is full and pre-committed, and the gate-window invariant
test refuses never-verified queries outside it — so new operators land
here, in a SEPARATE registry (``EXT3_QUERIES`` / ``EXT3_ORACLE``) that
``__spark_entry__.queries()`` does NOT include yet, with the driver's
own hash comparison run over every entry each suite run
(tests/test_extensions_r6.py).  At the r7 rotation these merge into the
main registry verbatim.

Round-6 operator wave: mergeable cardinality/frequency sketches (KMV,
deterministic HyperLogLog, Count-Min — ``operators/sketches.py``; the
reference exposes Presto's approx_distinct/approx_most_frequent at
``tasks.py``'s metric layer, these are the oracle-checkable Spark
equivalents), hard-negative mining for contrastive training
(``operators/similarity.py``), asymmetric shingle-set containment
dedup (``operators/dedup.py``), and curriculum ordering over the
range-partitioned prefix sum (``operators/mixing.py``).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from magi_etl_spark.tables import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]

EXT3_QUERIES: dict[str, QueryFn] = {}
EXT3_ORACLE: dict[str, str] = {}


def ext3_query(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        EXT3_QUERIES[name] = fn
        if oracle is not None:
            EXT3_ORACLE[name] = oracle
        return fn

    return deco


# --- cardinality / frequency sketches ---------------------------------------


@ext3_query(
    "q133_kmv_distinct",
    oracle="""
    WITH h AS (
        SELECT DISTINCT event_type,
               CAST(concat('0x', substr(md5(concat('kmv|',
                    CAST(user_id AS VARCHAR))), 1, 8)) AS BIGINT) AS _h
        FROM events
    ),
    kept AS (
        SELECT event_type, _h,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY _h) AS rn
        FROM h
    ),
    agg AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_seen, MAX(_h) AS kth
        FROM kept WHERE rn <= 64 GROUP BY event_type
    ),
    ex AS (
        SELECT event_type,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct
        FROM events GROUP BY event_type
    )
    SELECT a.event_type, a.n_seen,
           ROUND(CASE WHEN a.n_seen < 64 THEN CAST(a.n_seen AS DOUBLE)
                      ELSE 63.0 / (CAST(a.kth AS DOUBLE) / 4294967296.0)
                 END, 4) AS est_distinct,
           ex.exact_distinct
    FROM agg a JOIN ex ON a.event_type = ex.event_type
    """,
)
def q133_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-Minimum-Values distinct-user estimate per event type, exact
    count alongside for calibration: the sketch keeps the 64 smallest
    md5-derived 32-bit hashes per group — fixed state, mergeable, and
    reproduced literally by the oracle (the estimate is a single
    division of deterministic integers)."""
    from magi_etl_spark.operators.sketches import kmv_distinct

    e = load_table(spark, sf_dir, "events")
    est = kmv_distinct(e, ["event_type"], "user_id", k=64)
    exact = e.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_distinct")
    )
    return est.join(exact, "event_type").select(
        "event_type",
        F.col("n_seen").cast("long").alias("n_seen"),
        "est_distinct",
        F.col("exact_distinct").cast("long").alias("exact_distinct"),
    )


@ext3_query(
    "q134_hll_distinct",
    oracle="""
    WITH r AS (
        SELECT event_type,
               CAST(concat('0x', substr(md5(concat('hll|',
                    CAST(user_id AS VARCHAR))), 11, 2)) AS BIGINT) % 64 AS b,
               CAST(concat('0x', substr(md5(concat('hll|',
                    CAST(user_id AS VARCHAR))), 1, 10)) AS BIGINT) AS rest
        FROM events
    ),
    regs AS (
        SELECT event_type, b,
               MAX(CASE WHEN rest = 0 THEN 41
                        ELSE 41 - length(bin(rest)) END) AS reg
        FROM r GROUP BY event_type, b
    ),
    g AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_buckets,
               SUM(POWER(0.5, reg)) + (64 - COUNT(*)) AS hsum
        FROM regs GROUP BY event_type
    )
    SELECT event_type, n_buckets,
           ROUND(CASE WHEN (0.7213 / (1.0 + 1.079 / 64)) * 4096.0 / hsum
                           <= 160.0
                       AND n_buckets < 64
                      THEN 64.0 * ln(64.0 / (64.0 - CAST(n_buckets AS DOUBLE)))
                      ELSE (0.7213 / (1.0 + 1.079 / 64)) * 4096.0 / hsum
                 END, 4) AS est_distinct
    FROM g
    """,
)
def q134_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic HyperLogLog (m=64) distinct-user estimate per event
    type.  Register math is all-integer over disjoint md5 hex
    substrings, and the harmonic sum adds exact multiples of 2^-41 — so
    unlike Spark's builtin approx_count_distinct the estimate is
    engine-portable and the oracle reproduces it bit for bit (linear-
    counting small-range branch included)."""
    from magi_etl_spark.operators.sketches import hll_distinct

    e = load_table(spark, sf_dir, "events")
    return hll_distinct(e, ["event_type"], "user_id").select(
        "event_type",
        F.col("n_buckets").cast("long").alias("n_buckets"),
        "est_distinct",
    )


@ext3_query(
    "q135_cms_heavy_hitters",
    oracle="""
    WITH tok AS (
        SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS token
        FROM documents
    ),
    tc AS (
        SELECT token, CAST(COUNT(*) AS BIGINT) AS freq FROM tok GROUP BY token
    ),
    cells AS (
        SELECT token, freq, j,
               CAST(concat('0x', substr(md5(concat('cms',
                    CAST(j AS VARCHAR), '|', token)), 1, 8)) AS BIGINT)
                    % 256 AS b
        FROM tc, (SELECT unnest(range(0, 4)) AS j) js
    ),
    sketch AS (
        SELECT j, b, CAST(SUM(freq) AS BIGINT) AS cell_sum
        FROM cells GROUP BY j, b
    ),
    est AS (
        SELECT c.token, CAST(MIN(s.cell_sum) AS BIGINT) AS est_freq
        FROM cells c JOIN sketch s ON c.j = s.j AND c.b = s.b
        GROUP BY c.token
    ),
    top AS (SELECT token, freq FROM tc ORDER BY freq DESC, token LIMIT 20)
    SELECT t.token, t.freq, e.est_freq
    FROM top t JOIN est e ON t.token = e.token
    """,
)
def q135_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min heavy hitters: the corpus's top-20 tokens with their
    exact counts and the CMS estimate (depth 4 × width 256, salted md5
    rows).  est_freq >= freq always (collisions only overcount) — the
    oracle checks the exact estimates, the pytest suite pins the
    one-sided-error invariant corpus-wide."""
    from magi_etl_spark.operators.sketches import cms_counts

    d = load_table(spark, sf_dir, "documents")
    tc = (
        d.select(
            F.explode(
                F.regexp_extract_all(F.lower("text"), F.lit("[a-z]+"), 0)
            ).alias("token")
        )
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    est = cms_counts(tc, "token", "freq", depth=4, width=256)
    return (
        est.orderBy(F.desc("freq"), F.asc("token"))
        .limit(20)
        .select("token", "freq", F.col("est_freq").cast("long").alias("est_freq"))
    )


# --- contrastive mining / asymmetric dedup / curriculum ---------------------

_COS = (
    "list_sum(list_transform(range(1, len(av) + 1), i -> av[i] * bv[i]))"
    " / (sqrt(list_sum(list_transform(av, x -> x * x)))"
    " * sqrt(list_sum(list_transform(bv, x -> x * x))))"
)


@ext3_query(
    "q136_hard_negatives",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS bv
               FROM embeddings WHERE vec_id < 3),
    c AS (SELECT vec_id, embedding::DOUBLE[] AS av FROM embeddings),
    scored AS (
        SELECT q.query_id, c.vec_id, {_COS} AS s
        FROM c, q WHERE c.vec_id <> q.query_id
    ),
    band AS (SELECT * FROM scored WHERE s >= 0.2 AND s < 0.3),
    ranked AS (
        SELECT query_id, vec_id, s,
               CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY s DESC, vec_id) AS INTEGER) AS rn
        FROM band
    )
    SELECT query_id, vec_id, ROUND(s, 6) AS score, rn
    FROM ranked WHERE rn <= 5
    """,
)
def q136_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for query vectors 0-2: top-5 corpus vectors
    per query with cosine in the confusable band [0.2, 0.3) — similar
    enough to matter for a contrastive batch, below the positive
    threshold.  Broadcast query side, one map-side scoring scan."""
    from magi_etl_spark.operators.similarity import hard_negatives

    em = load_table(spark, sf_dir, "embeddings")
    return hard_negatives(
        em, em.where(F.col("vec_id") < 3), lo=0.2, hi=0.3, k=5
    )


@ext3_query(
    "q137_containment_pairs",
    oracle=r"""
    WITH t AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(trim(text), '\s+'),
                           x -> x <> '') AS toks
        FROM documents
    ),
    s AS (
        SELECT doc_id,
               list_distinct(CASE WHEN len(toks) >= 3
                    THEN list_transform(range(1, len(toks) - 1),
                         i -> concat(toks[i], ' ', toks[i+1], ' ', toks[i+2]))
                    ELSE CAST([] AS VARCHAR[]) END) AS sh
        FROM t
    ),
    nonempty AS (SELECT doc_id, sh FROM s WHERE len(sh) > 0),
    ex0 AS (SELECT doc_id, unnest(sh) AS shingle FROM nonempty),
    nd AS (SELECT COUNT(DISTINCT doc_id) AS n FROM ex0),
    rare AS (
        SELECT shingle FROM ex0, nd
        GROUP BY shingle, nd.n HAVING COUNT(*) <= 0.01 * nd.n
    ),
    ex AS (SELECT e.doc_id, e.shingle
           FROM ex0 e JOIN rare r ON e.shingle = r.shingle),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(COUNT(*) AS BIGINT) AS n_common
        FROM ex a JOIN ex b
          ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
        GROUP BY doc_a, doc_b
    )
    SELECT i.doc_a, i.doc_b, i.n_common,
           CAST(len(sa.sh) AS BIGINT) AS n_a,
           ROUND(i.n_common / len(sa.sh), 6) AS containment
    FROM inter i JOIN nonempty sa ON i.doc_a = sa.doc_id
    WHERE i.n_common / len(sa.sh) >= 0.4
    """,
)
def q137_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric near-superset detection: DIRECTED pairs where >= 40%
    of doc_a's 3-token shingles also occur in doc_b — the quoted-inside
    / subset-duplicate case Jaccard under-scores.  Stop-shingle pruning
    at 1% document frequency is the same scale lever as
    q29_ngram_jaccard_pairs; exact integer intersection counts keep the
    threshold engine-portable."""
    from magi_etl_spark.operators.dedup import containment_pairs

    d = load_table(spark, sf_dir, "documents")
    return containment_pairs(
        d, "doc_id", "text", n=3, threshold=0.4, max_doc_freq=0.01
    )


@ext3_query(
    "q138_curriculum_order",
    oracle="""
    WITH staged AS (
        SELECT doc_id, lang,
               CAST(least(n_chars // 500, 9) AS INTEGER) AS stage,
               substr(md5(concat('curriculum|',
                      CAST(doc_id AS VARCHAR))), 1, 8) AS draw
        FROM documents WHERE n_chars IS NOT NULL
    )
    SELECT doc_id, lang, stage,
           CAST(ROW_NUMBER() OVER (ORDER BY stage, draw, doc_id)
                AS BIGINT) AS curriculum_pos
    FROM staged
    """,
)
def q138_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum data order: documents binned into 10 length stages
    (easy→hard), hash-shuffled within each stage, with a GLOBAL 1-based
    position.  The Spark side computes the position with the range-
    partitioned two-pass prefix sum (operators/prefix.py) — no
    single-partition ORDER-BY-everything window — while the oracle's
    one-window ROW_NUMBER checks the exact same total order."""
    from magi_etl_spark.operators.mixing import curriculum_order

    d = load_table(spark, sf_dir, "documents").where(
        F.col("n_chars").isNotNull()
    ).select("doc_id", "lang", "n_chars")
    out = curriculum_order(
        d, F.least(F.floor(F.col("n_chars") / 500), F.lit(9)), "doc_id"
    )
    return out.select(
        "doc_id", "lang", "stage", F.col("curriculum_pos").cast("long").alias("curriculum_pos")
    )
