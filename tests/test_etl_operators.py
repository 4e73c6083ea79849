"""Unit tests for the warehouse-ETL operators behind q87–q94: SCD2 merge
semantics, profiler null/approx handling, gap-fill edges, BM25 sanity,
CDC log compaction, and the shared range-partitioned prefix sum."""

from __future__ import annotations

from datetime import date, datetime

from pyspark.sql import functions as F


def _ts(s: str):
    return datetime.fromisoformat(s)


def test_scd2_intervals_collapses_and_versions(spark):
    from magi_etl_spark.operators.scd2 import scd2_intervals

    log = spark.createDataFrame(
        [
            (1, "a", _ts("2024-01-01T00:00:00"), 1),
            (1, "a", _ts("2024-01-02T00:00:00"), 2),  # unchanged -> collapsed
            (1, "b", _ts("2024-01-03T00:00:00"), 3),
            (1, "a", _ts("2024-01-05T00:00:00"), 4),  # back to a: NEW version
            (2, None, _ts("2024-01-01T00:00:00"), 5),  # null attr first row
            (2, None, _ts("2024-01-02T00:00:00"), 6),  # null -> null: no change
            (2, "x", _ts("2024-01-04T00:00:00"), 7),
        ],
        "k long, attr string, ts timestamp, event_id long",
    )
    out = scd2_intervals(log, ["k"], "attr", "ts", ["event_id"])
    rows = {
        (r.k, r.version): (r.attr, r.valid_from, r.valid_to)
        for r in out.collect()
    }
    assert rows == {
        (1, 1): ("a", _ts("2024-01-01T00:00:00"), _ts("2024-01-03T00:00:00")),
        (1, 2): ("b", _ts("2024-01-03T00:00:00"), _ts("2024-01-05T00:00:00")),
        (1, 3): ("a", _ts("2024-01-05T00:00:00"), None),
        (2, 1): (None, _ts("2024-01-01T00:00:00"), _ts("2024-01-04T00:00:00")),
        (2, 2): ("x", _ts("2024-01-04T00:00:00"), None),
    }


def test_scd2_apply_merges_only_affected_keys(spark):
    from magi_etl_spark.operators.scd2 import scd2_apply, scd2_intervals

    log = spark.createDataFrame(
        [
            (1, "a", _ts("2024-01-01T00:00:00")),
            (1, "b", _ts("2024-01-03T00:00:00")),
            (2, "z", _ts("2024-01-01T00:00:00")),
        ],
        "k long, attr string, ts timestamp",
    )
    dim = scd2_intervals(log, ["k"], "attr", "ts")
    updates = spark.createDataFrame(
        [
            # late update INSIDE key 1's history: splits version 1
            (1, "c", _ts("2024-01-02T00:00:00")),
            # new key
            (3, "n", _ts("2024-01-04T00:00:00")),
        ],
        "k long, attr string, ts timestamp",
    )
    merged = scd2_apply(dim, updates, ["k"])
    rows = {
        (r.k, r.version): (r.attr, r.valid_from, r.valid_to)
        for r in merged.collect()
    }
    assert rows == {
        (1, 1): ("a", _ts("2024-01-01T00:00:00"), _ts("2024-01-02T00:00:00")),
        (1, 2): ("c", _ts("2024-01-02T00:00:00"), _ts("2024-01-03T00:00:00")),
        (1, 3): ("b", _ts("2024-01-03T00:00:00"), None),
        (2, 1): ("z", _ts("2024-01-01T00:00:00"), None),  # untouched
        (3, 1): ("n", _ts("2024-01-04T00:00:00"), None),
    }
    # idempotence: applying the same updates again changes nothing
    again = scd2_apply(merged, updates, ["k"])
    assert {
        (r.k, r.version): (r.attr, r.valid_from, r.valid_to)
        for r in again.collect()
    } == rows


def test_profile_table_nulls_and_approx(spark):
    from magi_etl_spark.operators.profile import profile_table

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "b"), (None, "b")],
        "x long, s string",
    )
    prof = {r.col: r for r in profile_table(df).collect()}
    assert prof["x"].n_rows == 4 and prof["x"].n_nulls == 1
    assert prof["x"].n_distinct == 3
    assert (prof["x"].min_s, prof["x"].max_s) == ("1", "3")
    assert prof["s"].n_nulls == 1 and prof["s"].n_distinct == 2
    approx = {r.col: r for r in profile_table(df, approx=True).collect()}
    # HLL on tiny cardinalities is exact
    assert approx["x"].n_distinct == 3
    # approx mode must not plan an Expand (the point of the trade)
    plan = profile_table(df, approx=True)._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan


def test_gapfill_interpolate_edges(spark):
    from magi_etl_spark.operators.timeseries import gapfill_interpolate

    pts = spark.createDataFrame(
        [
            ("g", date(2024, 1, 1), 10),
            ("g", date(2024, 1, 4), 40),  # 2-day hole: 20, 30
            ("g", date(2024, 1, 5), 0),
            ("h", date(2024, 2, 1), 7),  # singleton group: no grid rows added
        ],
        "grp string, day date, value long",
    )
    out = gapfill_interpolate(pts, ["grp"], "day", "value")
    rows = {(r.grp, r.day): (r.value, r.filled) for r in out.collect()}
    assert rows[("g", date(2024, 1, 2))] == (20.0, True)
    assert rows[("g", date(2024, 1, 3))] == (30.0, True)
    assert rows[("g", date(2024, 1, 1))] == (10.0, False)
    assert rows[("g", date(2024, 1, 5))] == (0.0, False)
    assert rows[("h", date(2024, 2, 1))] == (7.0, False)
    assert len(rows) == 6


def test_rolling_range_ignores_absent_days(spark):
    from magi_etl_spark.operators.timeseries import rolling_range_agg

    pts = spark.createDataFrame(
        [
            ("u", date(2024, 1, 1), 10),
            ("u", date(2024, 1, 7), 20),   # day 1 still inside 7d trailing
            ("u", date(2024, 1, 8), 30),   # day 1 now OUTSIDE
            ("u", date(2024, 1, 20), 5),   # isolated: window = itself
        ],
        "grp string, day date, value long",
    )
    out = {
        r.day: (r.rolling_sum_7d, r.rolling_n_7d)
        for r in rolling_range_agg(pts, ["grp"], "day", "value").collect()
    }
    assert out[date(2024, 1, 1)] == (10, 1)
    assert out[date(2024, 1, 7)] == (30, 2)
    assert out[date(2024, 1, 8)] == (50, 2)
    assert out[date(2024, 1, 20)] == (5, 1)


def test_bm25_ranks_relevant_doc_first(spark):
    from magi_etl_spark.operators.ranking import bm25_scores

    docs = spark.createDataFrame(
        [
            (1, "spark join shuffle join broadcast join"),
            (2, "spark filter pushdown"),
            (3, "pandas eager loops"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.score for r in bm25_scores(docs, ["join"]).collect()}
    assert set(out) == {1}  # only doc 1 matches
    multi = {
        r.doc_id: r.score
        for r in bm25_scores(docs, ["join", "filter"]).collect()
    }
    assert set(multi) == {1, 2}
    assert multi[1] > 0 and multi[2] > 0


def test_apply_cdc_tombstones_and_idempotence(spark):
    from magi_etl_spark.operators.upsert import apply_cdc

    log = spark.createDataFrame(
        [
            (1, 10, 1, "U", "a"),
            (1, 20, 2, "U", "b"),   # latest for key 1
            (2, 10, 3, "U", "x"),
            (2, 30, 4, "D", None),  # key 2 deleted
            (3, 5, 5, "D", None),
            (3, 6, 6, "U", "y"),    # re-created after delete
            (4, 7, 7, "U", "p"),
            (4, 7, 8, "U", "q"),    # same ts: event_id tiebreak -> q wins
        ],
        "k long, ts long, event_id long, op string, payload string",
    )
    state = apply_cdc(log, ["k"], "ts", "op", tiebreak_cols=["event_id"])
    rows = {r.k: r.payload for r in state.collect()}
    assert rows == {1: "b", 3: "y", 4: "q"}
    # replaying the full log over the compacted state converges
    replay = apply_cdc(
        state.select("k", "ts", "event_id", "op", "payload").unionByName(log),
        ["k"],
        "ts",
        "op",
        tiebreak_cols=["event_id"],
    )
    assert {r.k: r.payload for r in replay.collect()} == rows


def test_ranked_prefix_sum_matches_single_window(spark):
    from pyspark.sql import Window as W

    from magi_etl_spark.operators.prefix import ranked_prefix_sum

    df = spark.range(0, 1000).select(
        F.col("id"),
        (F.col("id") * 37 % 101).alias("v"),
    )
    got = {
        r.id: (r.rank, r.cum, r.total)
        for r in ranked_prefix_sum(
            df,
            [F.col("v").desc(), F.col("id")],
            "v",
            num_partitions=7,
            include_total=True,
        ).collect()
    }
    w = W.orderBy(F.col("v").desc(), F.col("id"))
    ref = {
        r.id: (r.rank, r.cum)
        for r in df.select(
            "id",
            F.row_number().over(w).alias("rank"),
            F.sum("v").over(w.rowsBetween(W.unboundedPreceding, 0)).alias("cum"),
        ).collect()
    }
    total = sum(i * 37 % 101 for i in range(1000))
    assert len(got) == 1000
    assert {k: v[:2] for k, v in got.items()} == ref
    assert all(v[2] == total for v in got.values())


def test_etl_operators_handle_empty_inputs(spark):
    """Empty frames flow through every new operator without errors:
    empty outputs everywhere except the profiler, which still emits one
    stats row per column (n_rows=0, NULL min/max)."""
    from magi_etl_spark.operators.prefix import ranked_prefix_sum
    from magi_etl_spark.operators.profile import profile_table
    from magi_etl_spark.operators.ranking import bm25_scores
    from magi_etl_spark.operators.scd2 import scd2_intervals
    from magi_etl_spark.operators.timeseries import gapfill_interpolate
    from magi_etl_spark.operators.upsert import apply_cdc

    log = spark.createDataFrame([], "k long, attr string, ts timestamp, seq long")
    assert scd2_intervals(log, ["k"], "attr", "ts", ["seq"]).count() == 0
    vals = spark.createDataFrame([], "id long, v long")
    assert (
        ranked_prefix_sum(
            vals, [F.col("v").desc(), F.col("id")], "v", include_total=True
        ).count()
        == 0
    )
    pts = spark.createDataFrame([], "grp string, day date, value long")
    assert gapfill_interpolate(pts, ["grp"], "day", "value").count() == 0
    cdc = spark.createDataFrame([], "k long, ts long, op string")
    assert apply_cdc(cdc, ["k"], "ts", "op").count() == 0
    docs = spark.createDataFrame([], "doc_id long, text string")
    assert bm25_scores(docs, ["a"]).count() == 0
    prof = {r.col: r for r in profile_table(
        spark.createDataFrame([], "x long, s string")
    ).collect()}
    assert set(prof) == {"x", "s"}
    assert prof["x"].n_rows == 0 and prof["x"].min_s is None
