"""End-to-end training-corpus curation: the flagship composition of the
LLM-data-pipeline operator families into one lazy DAG.

Stages (each one an operator documented elsewhere in ``operators/``):

1. **normalize** — control-char strip + whitespace collapse
   (``text.normalize_text``); empty-after-normalization documents drop.
2. **quality filter** — heuristic score + token floor
   (``text.quality_scores``).
3. **exact dedup** — md5 of normalized text, min-id winner per group.
4. **near dedup** — MinHash→LSH→verified Jaccard pairs collapsed to
   connected-component representatives (``dedup`` + ``components``),
   so A~B~C chains keep exactly one document.
5. **decontaminate** — n-gram containment against a benchmark set
   (``decontaminate``; skipped when no benchmark is supplied).
6. **split** — deterministic hash train/val/test assignment
   (``mixing.split_assign``).

Everything stays ONE lazy plan per output: ``curate_corpus`` returns
the curated DataFrame plus a per-stage survivor-count report built
from lazy one-row aggregates — calling code decides what to
materialize.  Scale posture is inherited from the parts: hash
group-bys, banded self-joins, broadcast benchmark postings, pure
projection splits; nothing driver-side but the report's counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from magi_etl_spark.operators.components import connected_components
from magi_etl_spark.operators.decontaminate import contamination_pairs
from magi_etl_spark.operators.dedup import minhash_lsh_dedup
from magi_etl_spark.operators.mixing import split_assign
from magi_etl_spark.operators.text import normalize_text, quality_scores


def curate_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 5,
    min_quality: float = 0.3,
    near_dup_threshold: float = 0.7,
    bench: DataFrame | None = None,
    bench_id: str = "bench_id",
    bench_text: str = "text",
    contamination_threshold: float = 0.8,
    splits: dict[str, float] | None = None,
    seed: str = "curate",
) -> tuple[DataFrame, DataFrame]:
    """Returns ``(curated, report)``: the curated corpus with
    ``split`` assigned, and a one-row-per-stage survivor-count report
    (``stage, rows``) whose stages read in pipeline order."""
    splits = splits or {"train": 0.9, "val": 0.05, "test": 0.05}
    stages: list[tuple[str, DataFrame]] = [("input", docs)]

    normalized = docs.select(
        F.col(id_col),
        normalize_text(F.col(text_col)).alias(text_col),
    ).where(F.col(text_col) != "")
    stages.append(("normalized", normalized))

    q = quality_scores(normalized, id_col, text_col)
    keep_q = q.where(
        (F.col("n_tokens") >= min_tokens)
        & (F.col("quality_score") >= min_quality)
    ).select(id_col)
    quality = normalized.join(keep_q, id_col, "semi")
    stages.append(("quality", quality))

    hashed = quality.withColumn("_h", F.md5(F.col(text_col)))
    winners = hashed.groupBy("_h").agg(F.min(id_col).alias(id_col))
    exact = hashed.join(winners, [id_col, "_h"], "semi").drop("_h")
    stages.append(("exact_dedup", exact))

    pairs = minhash_lsh_dedup(
        exact, id_col, text_col, threshold=near_dup_threshold
    ).select("doc_a", "doc_b")
    comps = connected_components(pairs, "doc_a", "doc_b")
    drops = comps.where(F.col("vertex") != F.col("component")).select(
        F.col("vertex").alias(id_col)
    )
    neardup = exact.join(drops, id_col, "left_anti")
    stages.append(("near_dedup", neardup))

    if bench is not None:
        contaminated = contamination_pairs(
            neardup,
            bench,
            doc_id=id_col,
            doc_text=text_col,
            bench_id=bench_id,
            bench_text=bench_text,
            threshold=contamination_threshold,
        ).select(id_col).distinct()
        clean = neardup.join(contaminated, id_col, "left_anti")
        stages.append(("decontaminated", clean))
    else:
        clean = neardup

    curated = split_assign(clean, id_col, splits, seed=seed)

    parts = [
        df.agg(F.lit(name).alias("stage"), F.count(F.lit(1)).alias("rows"))
        for name, df in stages
    ]
    report = parts[0]
    for p in parts[1:]:
        report = report.unionByName(p)
    return curated, report
