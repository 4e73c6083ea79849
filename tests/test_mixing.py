"""Weighted dataset mixing / deterministic sampling (operators/mixing.py)."""

import pytest
from pyspark.sql import functions as F

from magi_etl_spark.operators.mixing import (
    deterministic_sample,
    frac_threshold_hex,
    weighted_mix,
)


@pytest.fixture()
def docs(spark):
    return spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.element_at(
            F.array(F.lit("web"), F.lit("code"), F.lit("books"), F.lit("junk")),
            (F.col("id") % 4 + 1).cast("int"),
        ).alias("source"),
    )


def test_threshold_hex_edges():
    assert frac_threshold_hex(0.0) == "00000000"
    assert frac_threshold_hex(0.5) == "80000000"
    # 1.0 has no 8-hex form; "g" sorts above every hex string
    assert frac_threshold_hex(1.0) == "g"
    assert "ffffffff" < frac_threshold_hex(1.0)
    with pytest.raises(ValueError):
        frac_threshold_hex(1.5)


def test_sample_fraction_one_keeps_everything(docs):
    # the behavioral contract: fraction 1.0 keeps every row
    assert deterministic_sample(docs, "doc_id", 1.0).count() == docs.count()
    with pytest.raises(ValueError):
        deterministic_sample(docs, "doc_id", 1.5)


def test_deterministic_sample_stable_and_unbiased(docs):
    a = sorted(r.doc_id for r in deterministic_sample(docs, "doc_id", 0.5).collect())
    b = sorted(r.doc_id for r in deterministic_sample(docs, "doc_id", 0.5).collect())
    assert a == b  # same seed -> identical sample, independent of run
    c = sorted(
        r.doc_id for r in deterministic_sample(docs, "doc_id", 0.5, seed="other").collect()
    )
    assert a != c  # different seed -> different sample
    assert 400 < len(a) < 600  # ~half
    # repartitioning must not change the sample (unlike DataFrame.sample)
    d = sorted(
        r.doc_id
        for r in deterministic_sample(docs.repartition(7), "doc_id", 0.5).collect()
    )
    assert a == d


def test_weighted_mix_copy_counts(docs):
    mixed = weighted_mix(
        docs,
        {"web": 0.5, "code": 2.0, "books": 2.5, "junk": 0.0},
        source_col="source",
        key_col="doc_id",
    )
    by_src = {
        r.source: r
        for r in mixed.groupBy("source")
        .agg(
            F.count("*").alias("rows"),
            F.countDistinct("doc_id").alias("uniq"),
            F.max("copy_idx").alias("max_copy"),
        )
        .collect()
    }
    assert "junk" not in by_src  # weight 0 -> dropped
    assert by_src["code"].rows == 2 * by_src["code"].uniq == 500  # exact 2x
    assert by_src["code"].max_copy == 2
    assert 50 < by_src["web"].rows < 200  # ~125 of 250 kept once
    assert by_src["web"].max_copy == 1
    # 2.5x: every doc twice, about half a third time
    assert 2 * 250 < by_src["books"].rows < 3 * 250
    assert by_src["books"].uniq == 250 and by_src["books"].max_copy == 3
    # unknown sources fall back to default_weight (0 -> dropped)
    extra = docs.withColumn("source", F.lit("mystery"))
    assert weighted_mix(
        extra, {"web": 1.0}, source_col="source", key_col="doc_id"
    ).count() == 0


def test_weighted_mix_no_shuffle(docs):
    mixed = weighted_mix(
        docs, {"web": 1.5}, source_col="source", key_col="doc_id"
    )
    plan = mixed._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # project+filter+explode only


def test_split_assign_partition_and_disjointness(spark, sf_dir):
    from magi_etl_spark.operators.mixing import split_assign, split_dataset
    from magi_etl_spark.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    splits = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = split_assign(d, "doc_id", splits)
    # exhaustive and disjoint: every row gets exactly one label
    assert a.count() == d.count()
    counts = {r["split"]: r["n"] for r in a.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == d.count()
    assert 0.6 < counts["train"] / d.count() < 0.95  # ~0.8 with hash noise
    # stability: assignment is independent of partition layout
    b = split_assign(d.repartition(7), "doc_id", splits)
    pa = {r.doc_id: r["split"] for r in a.select("doc_id", "split").collect()}
    pb = {r.doc_id: r["split"] for r in b.select("doc_id", "split").collect()}
    assert pa == pb
    # split_dataset frames tile the input
    frames = split_dataset(d, "doc_id", splits)
    assert sum(f.count() for f in frames.values()) == d.count()


def test_split_assign_validation(spark, sf_dir):
    import pytest

    from magi_etl_spark.operators.mixing import split_assign
    from magi_etl_spark.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    with pytest.raises(ValueError, match="sum to 1"):
        split_assign(d, "doc_id", {"a": 0.5, "b": 0.3})
    with pytest.raises(ValueError, match="sum to 1"):
        split_assign(d, "doc_id", {"a": 1.5, "b": -0.5})
    with pytest.raises(ValueError, match="empty"):
        split_assign(d, "doc_id", {})
