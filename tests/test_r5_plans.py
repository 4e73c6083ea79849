"""Physical-plan locks for the round-5 operators — the broadcast /
join-shape / shuffle-count properties the scale story depends on,
asserted against the compiled plans (tests/test_plans.py discipline)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_merge_into_is_one_full_outer_join(spark):
    """The whole three-clause MERGE compiles to ONE full-outer join —
    every clause is a projection/filter of it, so the plan carries at
    most one shuffle per side and no extra join passes."""
    from magi_etl_spark.operators.merge import merge_into
    from magi_etl_spark.plans import lint

    target = spark.range(100_000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    source = spark.range(50_000).select(
        (F.col("id") * 2).alias("k"),
        F.lit(1).alias("v"),
        (F.col("id") % 5 == 0).alias("del"),
    )
    out = merge_into(target, source, ["k"], delete_col="del")
    p = _plan(out)
    assert p.count("FullOuter") == 1  # e.g. "SortMergeJoin [k], [k], FullOuter"
    assert "CartesianProduct" not in p
    assert not [f for f in lint(out, max_shuffles=2) if f.severity == "error"]


def test_dsir_ratio_table_is_broadcast(spark):
    """The 256-row bucket ratio table joins the token stream as a
    broadcast — the corpus side never shuffles on the bucket key."""
    from magi_etl_spark.operators.importance import dsir_scores
    from magi_etl_spark.plans import lint

    docs = spark.range(500).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("alpha beta gamma doc "), F.col("id")).alias("text"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("fr").alias("lang"),
    )
    out = dsir_scores(docs, docs.where("lang = 'en'"))
    p = _plan(out)
    assert "BroadcastHashJoin" in p
    assert not [f for f in lint(out) if f.severity == "error"]


def test_bpe_encode_symbol_table_is_broadcast(spark):
    """Corpus tokenization joins the (alphabet+merges)-sized symbol
    table as a broadcast; the per-document reassembly is the only
    doc-keyed shuffle after the word-keyed segmentation join."""
    from magi_etl_spark.operators.bpe import bpe_encode_docs
    from magi_etl_spark.plans import lint

    docs = spark.createDataFrame(
        [(i, "aa ab ba bb aa ab") for i in range(20)], "doc_id int, text string"
    )
    out = bpe_encode_docs(docs, n_merges=2)
    p = _plan(out)
    assert "BroadcastHashJoin" in p
    assert not [f for f in lint(out) if f.severity == "error"]


def test_incremental_lsh_pairs_band_join_is_keyed(spark, tmp_path):
    """The increment-vs-index candidate join keys on (band_idx,
    band_key) — a hash-partitioned join, never a cartesian pair
    product; nothing in the plan funnels through one partition."""
    from magi_etl_spark.operators.lsh_index import (
        build_lsh_index,
        incremental_lsh_pairs,
    )
    from magi_etl_spark.plans import lint

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon doc {i % 7}") for i in range(60)],
        "doc_id int, text string",
    )
    path = str(tmp_path / "idx")
    build_lsh_index(docs.where("doc_id % 10 != 0"), path)
    out = incremental_lsh_pairs(docs.where("doc_id % 10 = 0"), path)
    p = _plan(out)
    assert "CartesianProduct" not in p
    assert not [f for f in lint(out) if f.severity == "error"]


def test_pagerank_iteration_has_no_collect_and_lints_clean(spark):
    """One iteration's pre-checkpoint frame: the dangling mass rides as
    a broadcast 1-row aggregate (BroadcastNestedLoopJoin against the
    scalar is the expected warning), with no cartesian product and no
    unsafe single-partition funnel for the rank-sized frames."""
    from magi_etl_spark.operators.graph import pagerank
    from magi_etl_spark.plans import lint

    edges = spark.range(2000).select(
        (F.col("id") % 97).alias("src"), (F.col("id") % 89 + 100).alias("dst")
    )
    out = pagerank(edges, iterations=2)
    findings = lint(out)
    assert not [f for f in findings if f.severity == "error"]
