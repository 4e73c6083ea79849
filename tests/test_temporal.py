"""As-of join and binned range join (operators/temporal.py)."""

from pyspark.sql import functions as F

from magi_etl_spark.operators.temporal import asof_join, range_join


def _frames(spark):
    quotes = spark.createDataFrame(
        [("A", 10, 100.0), ("A", 20, 101.0), ("A", 30, 99.0), ("B", 15, 50.0)],
        "sym string, us long, px double",
    )
    trades = spark.createDataFrame(
        [("A", 5, 1), ("A", 10, 2), ("A", 25, 3), ("A", 35, 4), ("B", 14, 5), ("C", 9, 6)],
        "sym string, us long, trade_id int",
    )
    return trades, quotes


def test_asof_inner_semantics(spark):
    trades, quotes = _frames(spark)
    got = {
        r.trade_id: r
        for r in asof_join(trades, quotes, key="sym", ts="us").collect()
    }
    # trade@5: no quote yet -> dropped (inner); trade@10: equal ts matches
    assert set(got) == {2, 3, 4}
    assert got[2].asof_ts == 10 and got[2].asof_px == 100.0
    assert got[3].asof_ts == 20 and got[3].asof_px == 101.0
    assert got[4].asof_ts == 30 and got[4].asof_px == 99.0


def test_asof_left_keeps_unmatched(spark):
    trades, quotes = _frames(spark)
    got = {
        r.trade_id: r
        for r in asof_join(trades, quotes, key="sym", ts="us", how="left").collect()
    }
    assert len(got) == 6
    assert got[1].asof_ts is None and got[1].asof_px is None  # before any quote
    assert got[6].asof_ts is None  # key with no right rows at all
    assert got[5].asof_ts is None  # B trade@14 before B quote@15


def test_asof_single_shuffle_plan(spark):
    trades, quotes = _frames(spark)
    plan = (
        asof_join(trades, quotes, key="sym", ts="us")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # one exchange for the union'ed window partition, none after
    assert plan.count("Exchange hashpartitioning") == 1


def test_range_join_boundaries(spark):
    pts = spark.createDataFrame(
        [("u", 999_999, 1), ("u", 1_000_000, 2), ("u", 5_000_000, 3),
         ("u", 9_999_999, 4), ("u", 10_000_000, 5), ("v", 5_000_000, 6)],
        "key string, us long, pid int",
    )
    ivs = spark.createDataFrame(
        [("u", 1_000_000, 10_000_000, 100)],
        "key string, start_us long, end_us long, iv_id int",
    )
    got = sorted(
        r.pid
        for r in range_join(
            pts, ivs, key="key", ts="us", start="start_us", end="end_us",
            bin_seconds=2,
        ).collect()
    )
    # [start, end): 1_000_000 in, 9_999_999 in, 10_000_000 out, wrong key out
    assert got == [2, 3, 4]


def test_range_join_overlapping_intervals(spark):
    pts = spark.createDataFrame(
        [("u", 5_000_000, 1)], "key string, us long, pid int"
    )
    ivs = spark.createDataFrame(
        [("u", 0, 10_000_000, 100), ("u", 4_000_000, 6_000_000, 200),
         ("u", 6_000_000, 8_000_000, 300)],
        "key string, start_us long, end_us long, iv_id int",
    )
    got = sorted(
        r.iv_id
        for r in range_join(
            pts, ivs, key="key", ts="us", start="start_us", end="end_us",
            bin_seconds=1,
        ).collect()
    )
    assert got == [100, 200]  # all covering intervals, each exactly once
