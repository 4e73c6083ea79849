"""Bucketed-table co-located joins: same-key bucketing must remove the
shuffle from the join plan entirely."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from magi_etl_spark.sinks import slack_blocks_grouped, write_bucketed
from magi_etl_spark.tables import load_table


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    write_bucketed(o, "b_orders", "o_orderkey", 8, sort_col="o_orderkey")
    write_bucketed(
        l.withColumnRenamed("l_orderkey", "o_orderkey"), "b_lineitem", "o_orderkey", 8,
        sort_col="o_orderkey",
    )
    bo, bl = spark.table("b_orders"), spark.table("b_lineitem")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force non-broadcast
    try:
        joined = bl.join(bo, "o_orderkey").groupBy("o_orderstatus").count()
        buf = io.StringIO()
        with redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        # the join itself needs NO shuffle: both sides pre-bucketed on key
        join_section = plan.split("HashAggregate")[0]
        assert "SortMergeJoin" in plan
        assert "+- Exchange" not in join_section
        # correctness unchanged
        expected = (
            l.join(o, l.l_orderkey == o.o_orderkey).groupBy("o_orderstatus").count()
        )
        assert {tuple(r) for r in joined.collect()} == {
            tuple(r) for r in expected.collect()
        }
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_slack_blocks_grouped(spark):
    df = spark.createDataFrame(
        [("Games", "w1", 100), ("Games", "w2", 80), ("TV", "w3", 60)],
        "vertical string, wiki string, users int",
    )
    blocks = slack_blocks_grouped(
        df, "Trending by vertical", "vertical", ["wiki", "users"],
        top_n_per_group=1, order_by="users",
    )
    kinds = [b["type"] for b in blocks]
    assert kinds == ["header", "context", "section", "context", "section"]
    assert blocks[1]["elements"][0]["text"] == "*Games*"
    assert blocks[2]["fields"][0]["text"] == "*wiki*: w1"  # top-1 by users


def test_q80_registered_query_is_shuffle_free(spark, sf_dir):
    """The driver-gated q80 must demonstrate the co-located join: SMJ
    with zero Exchange below the join (both sides pre-bucketed+sorted)."""
    from magi_etl_spark.queries import QUERIES

    df = QUERIES["q80_bucketed_colocated_join"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert plan.split("SortMergeJoin")[-1].count("Exchange") == 0
