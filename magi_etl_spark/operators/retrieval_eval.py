"""Candidate-generator quality evaluation: precision/recall of an
approximate pair generator against exact ground truth.

Every approximate near-dup family in the engine (MinHash-LSH banding,
SimHash, SRP buckets, IVF probes) trades recall for candidate-set size.
This operator closes the loop: given the CANDIDATE pair set and the
EXACT qualifying pair set, it reports the confusion counts and rounded
precision/recall — the number you actually tune band counts / probe
widths against before a 100 TB run.

Scale shape: two keyed anti/semi joins on the (doc_a, doc_b) pair key
plus one global count aggregate (map-side combined) — never touches the
corpus itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def lsh_band_candidates(
    sigs: DataFrame,
    id_col: str,
    hash_cols: list[str],
    band_size: int,
) -> DataFrame:
    """Banded candidate pairs from a signature frame: hashes grouped
    into bands of ``band_size``, documents joined per band key —
    ``doc_a < doc_b``, distinct."""
    n = len(hash_cols)
    assert n % band_size == 0, "hash count must divide into bands"
    bands = [
        F.concat_ws(
            "|",
            F.lit(i // band_size),
            *[F.col(c) for c in hash_cols[i : i + band_size]],
        )
        for i in range(0, n, band_size)
    ]
    keyed = sigs.select(
        F.col(id_col).alias("doc"),
        F.explode(F.array(*bands)).alias("band_key"),
    )
    a = keyed.alias("a")
    b = keyed.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(
            F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b")
        )
        .distinct()
    )


def topk_recall(
    approx: DataFrame,
    exact: DataFrame,
    query_col: str = "query_id",
    id_col: str = "vec_id",
    round_dp: int = 6,
) -> DataFrame:
    """Per-query recall of an approximate top-k result against the
    exact one: ``query_id, n_exact, n_hits, recall``.  One keyed left
    join on (query, id) + one keyed aggregate — the standard ANN
    acceptance metric (recall@k of IVF/PQ probes vs the brute-force
    scan) at whatever query-set size the caller fans out."""
    e = exact.select(query_col, id_col)
    a = approx.select(query_col, id_col).withColumn("_hit", F.lit(1))
    j = e.join(a, [query_col, id_col], "left")
    return j.groupBy(query_col).agg(
        F.count("*").alias("n_exact"),
        F.sum(F.coalesce(F.col("_hit"), F.lit(0))).cast("long").alias(
            "n_hits"
        ),
        F.round(
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))).cast("double")
            / F.count("*"),
            round_dp,
        ).alias("recall"),
    )


def candidate_metrics(
    candidates: DataFrame,
    truth: DataFrame,
    round_dp: int = 6,
) -> DataFrame:
    """One row: ``tp, fp, fn, precision, recall`` of ``candidates``
    against ``truth`` (both keyed ``doc_a, doc_b``).  Counts are exact
    integers; the two ratios are single rounded divisions (empty sides
    emit NULL rather than dividing by zero)."""
    c = (
        candidates.select("doc_a", "doc_b")
        .distinct()
        .withColumn("_c", F.lit(1))
    )
    t = truth.select("doc_a", "doc_b").distinct().withColumn("_t", F.lit(1))
    j = c.join(t, ["doc_a", "doc_b"], "full_outer")
    out = j.agg(
        F.sum(
            F.when(F.col("_c").isNotNull() & F.col("_t").isNotNull(), 1)
            .otherwise(0)
        ).alias("tp"),
        F.sum(
            F.when(F.col("_c").isNotNull() & F.col("_t").isNull(), 1)
            .otherwise(0)
        ).alias("fp"),
        F.sum(
            F.when(F.col("_c").isNull() & F.col("_t").isNotNull(), 1)
            .otherwise(0)
        ).alias("fn"),
    )
    return out.select(
        "tp",
        "fp",
        "fn",
        F.when(
            F.col("tp") + F.col("fp") > 0,
            F.round(
                F.col("tp").cast("double") / (F.col("tp") + F.col("fp")),
                round_dp,
            ),
        ).alias("precision"),
        F.when(
            F.col("tp") + F.col("fn") > 0,
            F.round(
                F.col("tp").cast("double") / (F.col("tp") + F.col("fn")),
                round_dp,
            ),
        ).alias("recall"),
    )
