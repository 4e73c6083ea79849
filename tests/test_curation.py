"""End-to-end corpus-curation pipeline: planted junk, exact/near
duplicates, and contamination must each fall at the right stage, the
survivors carry deterministic splits, and the report counts agree."""

from __future__ import annotations

from pyspark.sql import functions as F

GOOD = (
    "the quick brown fox jumps over the lazy dog and then keeps on "
    "running through the quiet field toward the old farm house"
)
OTHER = (
    "spark engines shuffle partitioned data across executors while the "
    "optimizer prunes columns and pushes filters into the parquet scan"
)
LEAK = (
    "benchmark question about the capital of france and its population "
    "statistics in the modern era of european history records"
)


def _corpus(spark):
    rows = [
        (1, GOOD),
        (2, "\x02" + GOOD + "   "),          # normalizes to a dup of 1
        (3, GOOD.replace("dog", "cat")),      # near-dup of 1
        (4, OTHER),
        (5, "zz qq"),                         # fails the token floor
        (6, ""),                              # empty: drops at normalize
        (7, LEAK),                            # contaminated
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_curation_stages_drop_the_right_documents(spark):
    from magi_etl_spark.pipelines.curation import curate_corpus

    bench = spark.createDataFrame([(100, LEAK)], "bench_id long, text string")
    curated, report = curate_corpus(
        _corpus(spark),
        min_tokens=5,
        min_quality=0.0,
        near_dup_threshold=0.5,
        bench=bench,
    )
    rep = {r["stage"]: r["rows"] for r in report.collect()}
    assert rep["input"] == 7
    assert rep["normalized"] == 6          # the empty doc drops
    assert rep["quality"] == 5             # the two-token doc drops
    assert rep["exact_dedup"] == 4         # doc 2 collapses into doc 1
    assert rep["near_dedup"] == 3          # doc 3 collapses into doc 1
    assert rep["decontaminated"] == 2      # the leak drops
    ids = {r["doc_id"] for r in curated.collect()}
    assert ids == {1, 4}
    # normalization is reflected in the surviving text
    texts = {r["doc_id"]: r["text"] for r in curated.collect()}
    assert texts[1] == GOOD


def test_curation_split_is_deterministic_and_total(spark):
    from magi_etl_spark.pipelines.curation import curate_corpus

    docs = spark.createDataFrame(
        [(i, f"document number {i} with enough tokens to pass the floor easily")
         for i in range(200)],
        "doc_id long, text string",
    )
    c1, _ = curate_corpus(docs, min_quality=0.0, splits={"train": 0.8, "val": 0.2})
    c2, _ = curate_corpus(docs, min_quality=0.0, splits={"train": 0.8, "val": 0.2})
    a = sorted((r["doc_id"], r["split"]) for r in c1.collect())
    b = sorted((r["doc_id"], r["split"]) for r in c2.collect())
    assert a == b
    assert {s for _, s in a} <= {"train", "val"}
    # near-dup unique documents: every input survives to the split
    assert len(a) == 200


def test_curation_without_benchmark_skips_decontamination(spark):
    from magi_etl_spark.pipelines.curation import curate_corpus

    curated, report = curate_corpus(
        _corpus(spark), min_quality=0.0, near_dup_threshold=0.5
    )
    stages = [r["stage"] for r in report.collect()]
    assert "decontaminated" not in stages
    assert 7 in {r["doc_id"] for r in curated.collect()}  # leak survives
