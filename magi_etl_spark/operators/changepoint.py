"""Sequential time-series state machines: CUSUM changepoint profiles
and Holt linear (double-exponential) smoothing.

Both are inherently per-series recursions — S_t depends on S_{t-1} — so
the Spark shape is ``applyInPandas`` partitioned by series: every series
runs its scan sequentially (the algorithm's data dependence), all series
run in parallel, and per-task state is O(1).  That is the correct 100 TB
posture for "millions of series × thousands of points": the shuffle is
one keyed exchange, and no window ever spans the corpus.

Determinism is engineered so a SQL oracle can replay the recursion
exactly (as a recursive CTE):

- CUSUM runs on INTEGER series values with an integer drift allowance
  ``k`` (floor-mean) and integer threshold ``h`` — every state value is
  exact, no floats anywhere.
- Holt uses alpha = beta = 0.5.  Multiplying an IEEE double by 0.5 is
  EXACT, and addition rounds identically in every IEEE-754 engine, so
  the level/trend trajectories are bit-identical between Spark
  (numpy float64 in the Arrow batch) and the oracle's double
  arithmetic — no "close enough" tolerance needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cusum_params(
    points: DataFrame,
    series_col: str = "series",
    value_col: str = "x",
    h_mult: int = 5,
) -> DataFrame:
    """Per-series CUSUM calibration from a baseline window: the integer
    drift allowance ``k`` (floor-mean) and threshold ``h`` (``h_mult``
    x floor-mean absolute deviation) — the parameters a streaming
    monitor holds fixed while it scans new observations."""
    params = points.groupBy(series_col).agg(
        F.expr(f"sum({value_col}) DIV count(*)").alias("k")
    )
    return (
        points.join(params, series_col)
        .groupBy(series_col, "k")
        .agg(
            (
                F.expr(f"sum(abs({value_col} - k)) DIV count(*)")
                * F.lit(int(h_mult))
            ).alias("h")
        )
    )


def cusum_step(
    state: DataFrame,
    obs: DataFrame,
    params: DataFrame,
    series_col: str = "series",
    value_col: str = "x",
) -> DataFrame:
    """One CUSUM transition: apply a batch of per-series observations to
    the persisted ``(series, cusum_pos, cusum_neg)`` state under fixed
    ``(k, h)`` calibration.  Series absent from the batch carry their
    state unchanged; series with no prior state start at zero; series
    without calibration are ignored (no k to test against).  Returns
    the NEW state frame ``series, x, cusum_pos, cusum_neg, alarm``
    (``x`` NULL for carried-forward series) — all-integer, one keyed
    full-outer join + one broadcast params join per step."""
    s = state.select(
        F.col(series_col),
        F.col("cusum_pos").alias("_sp"),
        F.col("cusum_neg").alias("_sn"),
    )
    o = obs.select(series_col, F.col(value_col).alias("_x"))
    j = s.join(o, series_col, "full_outer").join(
        F.broadcast(params), series_col
    )
    sp0 = F.coalesce(F.col("_sp"), F.lit(0))
    sn0 = F.coalesce(F.col("_sn"), F.lit(0))
    sp1 = F.when(
        F.col("_x").isNotNull(),
        F.greatest(F.lit(0), sp0 + F.col("_x") - F.col("k")),
    ).otherwise(sp0)
    sn1 = F.when(
        F.col("_x").isNotNull(),
        F.greatest(F.lit(0), sn0 + F.col("k") - F.col("_x")),
    ).otherwise(sn0)
    return j.select(
        F.col(series_col),
        F.col("_x").alias("x"),
        sp1.cast("long").alias("cusum_pos"),
        sn1.cast("long").alias("cusum_neg"),
        ((sp1 > F.col("h")) | (sn1 > F.col("h")))
        .cast("int")
        .alias("alarm"),
    )


def cusum_profile(
    points: DataFrame,
    series_col: str = "series",
    order_col: str = "day",
    value_col: str = "x",
    h_mult: int = 5,
) -> DataFrame:
    """Two-sided CUSUM over integer-valued points.

    Per series: ``k = floor-mean`` of the values (integer DIV), ``h =
    h_mult * floor-mean absolute deviation from k``; then the scan
    ``S+_t = max(0, S+_{t-1} + x_t - k)``, ``S-_t = max(0, S-_{t-1} +
    k - x_t)`` with an alarm whenever either side exceeds ``h``.
    Returns ``series, day, x, cusum_pos, cusum_neg, alarm`` —
    all-integer, so a recursive-CTE oracle replays it exactly.
    """
    import pandas as pd

    params = points.groupBy(series_col).agg(
        F.expr(f"sum({value_col}) DIV count(*)").alias("_k")
    )
    with_k = points.join(params, series_col)
    hs = with_k.groupBy(series_col).agg(
        (
            F.expr(f"sum(abs({value_col} - _k)) DIV count(*)")
            * F.lit(int(h_mult))
        ).alias("_h")
    )
    staged = with_k.join(hs, series_col).select(
        series_col, order_col, value_col, "_k", "_h"
    )

    def scan(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col).reset_index(drop=True)
        k = int(pdf["_k"].iloc[0])
        h = int(pdf["_h"].iloc[0])
        sp = sn = 0
        pos, neg, alarm = [], [], []
        for x in pdf[value_col].astype("int64"):
            x = int(x)
            sp = max(0, sp + x - k)
            sn = max(0, sn + k - x)
            pos.append(sp)
            neg.append(sn)
            alarm.append(1 if (sp > h or sn > h) else 0)
        out = pdf[[series_col, order_col, value_col]].copy()
        out["cusum_pos"] = pd.Series(pos, dtype="int64")
        out["cusum_neg"] = pd.Series(neg, dtype="int64")
        out["alarm"] = pd.Series(alarm, dtype="int32")
        return out

    from pyspark.sql.types import IntegerType, LongType, StructField, StructType

    base = staged.select(series_col, order_col, value_col).schema
    schema = StructType(
        list(base.fields)
        + [
            StructField("cusum_pos", LongType()),
            StructField("cusum_neg", LongType()),
            StructField("alarm", IntegerType()),
        ]
    )
    return staged.groupBy(series_col).applyInPandas(scan, schema=schema)


def holt_smooth(
    points: DataFrame,
    series_col: str = "series",
    order_col: str = "day",
    value_col: str = "x",
    round_dp: int = 4,
) -> DataFrame:
    """Holt linear smoothing with alpha = beta = 0.5 (dyadic, so every
    step is exact-IEEE and engine-portable).

    Init: ``level_1 = x_1``, ``trend_1 = 0``.  Step:
    ``level_t = 0.5 * x_t + 0.5 * (level + trend)``,
    ``trend_t = 0.5 * (level_t - level_{t-1}) + 0.5 * trend_{t-1}``.
    Returns ``series, day, x, level, trend`` with level/trend rounded
    to ``round_dp`` (the underlying doubles are already bit-identical
    to the oracle's)."""
    import pandas as pd

    staged = points.select(series_col, order_col, value_col)

    def scan(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col).reset_index(drop=True)
        levels, trends = [], []
        level = trend = None
        for x in pdf[value_col]:
            x = float(x)
            if level is None:
                level, trend = x, 0.0
            else:
                prev = level
                level = 0.5 * x + 0.5 * (level + trend)
                trend = 0.5 * (level - prev) + 0.5 * trend
            levels.append(level)
            trends.append(trend)
        out = pdf[[series_col, order_col, value_col]].copy()
        out["level"] = pd.Series(levels, dtype="float64")
        out["trend"] = pd.Series(trends, dtype="float64")
        return out

    from pyspark.sql.types import DoubleType, StructField, StructType

    schema = StructType(
        list(staged.schema.fields)
        + [StructField("level", DoubleType()), StructField("trend", DoubleType())]
    )
    return (
        staged.groupBy(series_col)
        .applyInPandas(scan, schema=schema)
        .withColumn("level", F.round("level", round_dp))
        .withColumn("trend", F.round("trend", round_dp))
    )
