"""Similarity-search query inventory over the ``embeddings`` table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from magi_etl_spark.operators import similarity as S
from magi_etl_spark.queries import query
from magi_etl_spark.tables import load_table

# Manual double-precision cosine shared by the oracles: cast to double
# BEFORE multiplying so per-element products match Spark bit-for-bit.
_COSINE = (
    "list_sum(list_transform(range(1, len(av) + 1), i -> av[i] * bv[i]))"
    " / (sqrt(list_sum(list_transform(av, x -> x * x)))"
    " * sqrt(list_sum(list_transform(bv, x -> x * x))))"
)


@query(
    "q27_embedding_topk",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS bv
               FROM embeddings WHERE vec_id = 0),
    c AS (SELECT vec_id, embedding::DOUBLE[] AS av FROM embeddings),
    scored AS (
        SELECT q.query_id, c.vec_id, {_COSINE} AS s
        FROM c, q WHERE c.vec_id <> q.query_id
    ),
    ranked AS (
        SELECT query_id, vec_id, s,
               CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY s DESC, vec_id)
                    AS INTEGER) AS rn
        FROM scored
    )
    SELECT query_id, vec_id, ROUND(s, 6) AS score, rn
    FROM ranked WHERE rn <= 10
    """,
)
def q27_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k ANN baseline: broadcast the query set,
    map-side score the corpus, per-query top-k window."""
    e = load_table(spark, sf_dir, "embeddings")
    return S.cosine_topk(e, e.where(F.col("vec_id") == 0), k=10)


def _dedup_planes() -> list[list[float]]:
    import random

    rng = random.Random(11)
    return [[rng.uniform(-1, 1) for _ in range(64)] for _ in range(2)]


def _q44_oracle() -> str:
    bits = []
    for p in _dedup_planes():
        arr = "[" + ", ".join(repr(x) for x in p) + "]"
        bits.append(
            "(CASE WHEN list_sum(list_transform(range(1, len(v) + 1),"
            f" i -> v[i] * ({arr})[i])) >= 0 THEN '1' ELSE '0' END)"
        )
    bucket = " || ".join(bits)
    cos = (
        "list_sum(list_transform(range(1, len(av) + 1), i -> av[i] * bv[i]))"
        " / (na * nb)"
    )
    return f"""
    WITH e AS (
        SELECT vec_id, embedding::DOUBLE[] AS v,
               sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS norm
        FROM embeddings
    ),
    bucketed AS (SELECT vec_id, v, norm, {bucket} AS bucket FROM e),
    pairs AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.bucket AS block,
               a.v AS av, b.v AS bv, a.norm AS na, b.norm AS nb
        FROM bucketed a JOIN bucketed b
          ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    )
    SELECT id_a, id_b, block, ROUND({cos}, 6) AS score
    FROM pairs WHERE {cos} >= 0.35
    """


@query("q44_lsh_blocked_embedding_dedup")
def q44_lsh_blocked_embedding_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup at scale: SRP-LSH buckets as the blocking key,
    pairwise cosine only within buckets — candidate generation is the
    bucket join, never all-pairs.  (q28 shows the same operator blocked by
    an existing label column.)"""
    from magi_etl_spark.operators.similarity import blocked_neardup_pairs, srp_lsh_buckets

    e = load_table(spark, sf_dir, "embeddings")
    buckets = srp_lsh_buckets(e, seed_planes=_dedup_planes())
    blocked = e.join(buckets, "vec_id")
    return blocked_neardup_pairs(blocked, "bucket", threshold=0.35)


from magi_etl_spark.queries import ORACLE  # noqa: E402

ORACLE["q44_lsh_blocked_embedding_dedup"] = _q44_oracle()


# Squared L2 distance between a corpus vector v and centroid c (DuckDB).
_D2 = (
    "list_sum(list_transform(range(1, len({v}) + 1),"
    " i -> ({v}[i] - {c}[i]) * ({v}[i] - {c}[i])))"
)


@query(
    "q41_ivf_topk",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    cent AS (
        SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS list_id,
               v AS c
        FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 8)
    ),
    assigned AS (
        SELECT vec_id, v, list_id FROM (
            SELECT e.vec_id, e.v, cent.list_id,
                   row_number() OVER (PARTITION BY e.vec_id ORDER BY
                       {_D2.format(v="e.v", c="cent.c")} ASC, cent.list_id ASC) AS rn
            FROM e, cent
        ) WHERE rn = 1
    ),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 3),
    probes AS (
        SELECT query_id, qv, list_id FROM (
            SELECT q.query_id, q.qv, cent.list_id,
                   row_number() OVER (PARTITION BY q.query_id ORDER BY
                       {_D2.format(v="q.qv", c="cent.c")} ASC, cent.list_id ASC) AS pr
            FROM q, cent
        ) WHERE pr <= 2
    ),
    scored AS (
        SELECT p.query_id, a.vec_id, a.v AS av, p.qv AS bv
        FROM assigned a JOIN probes p
          ON a.list_id = p.list_id AND a.vec_id <> p.query_id
    ),
    ranked AS (
        SELECT query_id, vec_id, {_COSINE} AS s,
               CAST(row_number() OVER (PARTITION BY query_id
                    ORDER BY {_COSINE} DESC, vec_id) AS INTEGER) AS rn
        FROM scored
    )
    SELECT query_id, vec_id, ROUND(s, 6) AS score, rn
    FROM ranked WHERE rn <= 10
    """,
)
def q41_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-k with a deterministic sampled-centroid coarse
    quantizer: each query probes its 2 nearest of 8 inverted lists (25%
    scan fraction).  The sampled quantizer makes the whole IVF path
    order-deterministic and SQL-expressible, so the driver can
    hash-check it end to end; the KMeans quantizer variant
    (``ivf_index``) has its recall tested in tests/test_ivf.py."""
    from magi_etl_spark.operators.similarity import ivf_index_sampled, ivf_topk

    e = load_table(spark, sf_dir, "embeddings")
    assigned, centroids = ivf_index_sampled(e, n_lists=8)
    return ivf_topk(assigned, centroids, e.where(F.col("vec_id") < 3), k=10, n_probe=2)


@query(
    "q86_ivf_kmeans_topk",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    cent AS (
        SELECT CAST(row_number() OVER (ORDER BY md5('s7' || CAST(vec_id AS VARCHAR)), vec_id)
                    - 1 AS INTEGER) AS list_id,
               v AS c
        FROM (SELECT vec_id, v FROM e
              ORDER BY md5('s7' || CAST(vec_id AS VARCHAR)), vec_id LIMIT 8)
    ),
    assigned AS (
        SELECT vec_id, v, list_id FROM (
            SELECT e.vec_id, e.v, cent.list_id,
                   row_number() OVER (PARTITION BY e.vec_id ORDER BY
                       {_D2.format(v="e.v", c="cent.c")} ASC, cent.list_id ASC) AS rn
            FROM e, cent
        ) WHERE rn = 1
    ),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id >= 3 AND vec_id < 6),
    probes AS (
        SELECT query_id, qv, list_id FROM (
            SELECT q.query_id, q.qv, cent.list_id,
                   row_number() OVER (PARTITION BY q.query_id ORDER BY
                       {_D2.format(v="q.qv", c="cent.c")} ASC, cent.list_id ASC) AS pr
            FROM q, cent
        ) WHERE pr <= 3
    ),
    scored AS (
        SELECT p.query_id, a.vec_id, a.v AS av, p.qv AS bv
        FROM assigned a JOIN probes p
          ON a.list_id = p.list_id AND a.vec_id <> p.query_id
    ),
    ranked AS (
        SELECT query_id, vec_id, {_COSINE} AS s,
               CAST(row_number() OVER (PARTITION BY query_id
                    ORDER BY {_COSINE} DESC, vec_id) AS INTEGER) AS rn
        FROM scored
    )
    SELECT query_id, vec_id, ROUND(s, 6) AS score, rn
    FROM ranked WHERE rn <= 10
    """,
)
def q86_ivf_kmeans_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-k with the seeded hash-sampled coarse quantizer
    (``init="hash"``): centroids are a uniform deterministic draw over
    the corpus (smallest ``md5(seed||id)``), fixing the crowded-centroid
    degeneracy of the smallest-id sampler when the id space is clustered
    — while staying fully SQL-expressible so the driver hash-checks the
    whole probe path.  The k-means||-style ``init="spread"`` variant
    (hash-oversample + greedy farthest-point) has its recall-vs-exact
    bound tested at 8x probe scale in tests/test_ivf.py."""
    from magi_etl_spark.operators.similarity import ivf_index_sampled, ivf_topk

    e = load_table(spark, sf_dir, "embeddings")
    assigned, centroids = ivf_index_sampled(e, n_lists=8, init="hash", seed=7)
    return ivf_topk(
        assigned,
        centroids,
        e.where((F.col("vec_id") >= 3) & (F.col("vec_id") < 6)),
        k=10,
        n_probe=3,
    )


@query(
    "q28_embedding_neardup",
    oracle=f"""
    WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
    pairs AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.label AS block,
               a.v AS av, b.v AS bv
        FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
    )
    SELECT id_a, id_b, block, ROUND({_COSINE}, 6) AS score
    FROM pairs WHERE {_COSINE} >= 0.4
    """,
)
def q28_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-duplicate pairs within blocking buckets (label =
    stand-in for an LSH/IVF bucket): per-bucket pairwise cosine, threshold
    filter — the blocked form of embedding dedup that scales."""
    e = load_table(spark, sf_dir, "embeddings")
    return S.blocked_neardup_pairs(e, "label", threshold=0.4)
