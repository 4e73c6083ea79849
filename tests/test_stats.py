"""Winsorization and robust scaling — exactness vs a hand oracle, NULL
policy, and the approx/broadcast scale paths."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _frame(spark):
    rows = [("a", float(v)) for v in range(1, 11)] + [
        ("a", 1000.0),  # the outlier winsorize exists to tame
        ("b", 5.0),
        ("b", 5.0),
        ("b", 5.0),  # constant group: IQR == 0
        ("a", None),
    ]
    return spark.createDataFrame(rows, "g string, v double")


def test_winsorize_clips_to_exact_percentiles(spark):
    from magi_etl_spark.operators.stats import winsorize

    df = _frame(spark).where(F.col("v").isNotNull())
    out = winsorize(df, ["g"], "v", lo=0.0, hi=0.9)
    a = [r["v_w"] for r in out.where(F.col("g") == "a").collect()]
    # group a = 1..10 plus 1000; p90 (linear interpolation over 11 pts)
    # = 10th order stat = 10.0 -> the outlier clips to 10.0
    assert max(a) == pytest.approx(10.0)
    assert min(a) == pytest.approx(1.0)  # lo=0 never lifts the minimum
    assert sorted(a)[:10] == pytest.approx(sorted(float(v) for v in range(1, 11)))


def test_winsorize_keeps_nulls_null(spark):
    from magi_etl_spark.operators.stats import winsorize

    out = winsorize(_frame(spark), ["g"], "v", lo=0.1, hi=0.9)
    nulls = out.where(F.col("v").isNull()).collect()
    assert len(nulls) == 1 and nulls[0]["v_w"] is None


def test_winsorize_validates_band():
    from magi_etl_spark.operators.stats import group_percentile_bounds

    with pytest.raises(ValueError):
        group_percentile_bounds(None, ["g"], "v", lo=0.9, hi=0.1)


def test_robust_scale_median_iqr_and_zero_iqr_policy(spark):
    from magi_etl_spark.operators.stats import robust_scale

    df = _frame(spark).where(F.col("v").isNotNull())
    out = robust_scale(df, ["g"], "v")
    a = {r["v"]: r["v_rs"] for r in out.where(F.col("g") == "a").collect()}
    # group a: median of 1..10,1000 is 6; IQR = p75 - p25 = 8.5 - 3.5
    assert a[6.0] == pytest.approx(0.0)
    assert a[1000.0] == pytest.approx((1000 - 6) / 5.0)
    # constant group scales to NULL, never +-inf
    b = [r["v_rs"] for r in out.where(F.col("g") == "b").collect()]
    assert b == [None, None, None]


def test_approx_and_shuffle_bound_paths_agree_on_smooth_data(spark):
    from magi_etl_spark.operators.stats import winsorize

    df = spark.createDataFrame(
        [(f"g{i % 4}", float(i)) for i in range(400)], "g string, v double"
    )
    exact = winsorize(df, ["g"], "v", lo=0.05, hi=0.95)
    approx = winsorize(
        df, ["g"], "v", lo=0.05, hi=0.95, approx=True, broadcast_bounds=False
    )
    e = exact.agg(F.sum("v_w")).first()[0]
    s = approx.agg(F.sum("v_w")).first()[0]
    # sketch bounds land within a percentile step of the exact ones
    assert s == pytest.approx(e, rel=0.02)
    assert exact.count() == approx.count() == 400


def test_null_group_rows_survive_with_their_own_bounds(spark):
    """r4 ADVICE: the plain equi-join dropped NULL-group rows entirely;
    the null-safe join keeps them, clipped against the NULL group's own
    bounds row like any other group."""
    from magi_etl_spark.operators.stats import robust_scale, winsorize

    rows = [("a", 1.0), ("a", 2.0), (None, 10.0), (None, 20.0), (None, 30.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    w = winsorize(df, ["g"], "v", lo=0.0, hi=1.0)
    assert w.count() == 5  # nothing dropped
    null_w = {r["v"]: r["v_w"] for r in w.where(F.col("g").isNull()).collect()}
    assert null_w == {10.0: 10.0, 20.0: 20.0, 30.0: 30.0}
    rs = robust_scale(df, ["g"], "v")
    assert rs.count() == 5
    null_rs = {r["v"]: r["v_rs"] for r in rs.where(F.col("g").isNull()).collect()}
    # NULL group: median 20, IQR = 25 - 15 = 10
    assert null_rs[20.0] == pytest.approx(0.0)
    assert null_rs[30.0] == pytest.approx(1.0)
