"""Physical-plan locks for the r7 operator wave: the scale-bearing
choices (map-side pair explode, broadcast peel filters, banded joins,
prefix-sum cumulative) must be visible in the compiled plan, not just
implied by the code."""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_kcore_peel_filters_are_broadcast(spark, sf_dir):
    from magi_etl_spark.operators.kcore import (
        cooccurrence_edges,
        peel_round,
    )
    from magi_etl_spark.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    edges = cooccurrence_edges(li, "l_orderkey", "l_suppkey")
    plan = _plan(peel_round(edges, k=3))
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_cooccurrence_edges_have_no_join(spark, sf_dir):
    """The combination explode replaced the self-join: the edge plan
    must contain NO join node at all."""
    from magi_etl_spark.operators.kcore import cooccurrence_edges
    from magi_etl_spark.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    plan = _plan(cooccurrence_edges(li, "l_orderkey", "l_suppkey"))
    assert "Join" not in plan


def test_similarity_join_is_keyed_not_cartesian(spark, sf_dir):
    from magi_etl_spark.operators.setjoin import shingle_sets, similarity_join
    from magi_etl_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    plan = _plan(similarity_join(shingle_sets(docs), Fraction(1, 2)))
    assert "CartesianProduct" not in plan
    # the candidate join keys on the prefix token
    assert "tok" in plan


def test_concurrency_profile_has_no_single_partition_window(spark, sf_dir):
    from magi_etl_spark.operators.engagement import concurrency_profile
    from magi_etl_spark.plans import lint
    from magi_etl_spark.tables import load_table

    df = concurrency_profile(load_table(spark, sf_dir, "events"))
    assert not [f for f in lint(df) if f.severity == "error"]


def test_winnow_windows_are_doc_partitioned(spark, sf_dir):
    from magi_etl_spark.operators.winnow import winnow_fingerprints
    from magi_etl_spark.plans import lint
    from magi_etl_spark.tables import load_table

    fps = winnow_fingerprints(load_table(spark, sf_dir, "documents"))
    assert not [f for f in lint(fps) if f.severity == "error"]
    assert "doc_id" in _plan(fps)


def test_rendezvous_is_expression_only(spark, sf_dir):
    """No join, no explode — the HRW pick is one projected array_max."""
    from magi_etl_spark.operators.rendezvous import rendezvous_shard
    from magi_etl_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    plan = _plan(
        docs.select(rendezvous_shard(F.col("doc_id"), 16).alias("s"))
    )
    assert "Join" not in plan and "Generate" not in plan


def test_gini_window_is_group_partitioned(spark, sf_dir):
    from magi_etl_spark.operators.inequality import gini_by_group
    from magi_etl_spark.plans import lint
    from magi_etl_spark.tables import load_table

    orders = load_table(spark, sf_dir, "orders")
    out = gini_by_group(
        orders.select(
            F.col("o_orderpriority").alias("g"),
            "o_custkey",
            F.round(F.col("o_totalprice") * 100).cast("long").alias("m"),
        ),
        ["g"],
        "o_custkey",
        F.col("m"),
    )
    assert not [f for f in lint(out) if f.severity == "error"]
