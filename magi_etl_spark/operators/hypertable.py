"""Hypertable rollup: multi-resolution time-bucketed aggregates in one
pass (brief-listed custom operator; TimescaleDB's continuous-aggregate
pattern re-expressed for Spark).

The naive form scans the fact table once PER resolution.  The scalable
form aggregates the facts once at the FINEST resolution, then derives
every coarser level by reaggregating the previous level — legal for
mergeable aggregates (sum/count/min/max; see rollup_refresh for why
COUNT(DISTINCT) is excluded) and orders of magnitude cheaper, because
each cascade step consumes an already-aggregated frame whose size is
bounded by (buckets x groups), not by rows.

Buckets are ``floor(epoch / width) * width`` on integer epoch-micros:
deterministic, engine-portable, and independent of session timezones
(calendar-aware weeks/months belong to AnchorCalendar, not here).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from magi_etl_spark.operators.rollup_refresh import MetricCol


def time_bucket(us: Column, width_seconds: int) -> Column:
    """Bucket start (epoch micros) for a fixed width."""
    w = F.lit(width_seconds * 1_000_000)
    return (F.floor(us / w) * w).cast("long")


def hypertable_rollup(
    df: DataFrame,
    us_col: str,
    group_cols: list[str],
    metrics: list[MetricCol],
    exprs: dict,
    resolutions: list[int] = (3600, 86400, 604800),
) -> DataFrame:
    """Aggregates at every resolution (seconds, ascending), cascaded from
    the finest level.  Output: ``resolution_sec``, ``bucket_us``,
    ``group_cols...``, one column per metric."""
    res = sorted(resolutions)
    for fine, coarse in zip(res, res[1:]):
        if coarse % fine != 0:
            raise ValueError(
                f"resolutions must nest for cascaded reaggregation: "
                f"{coarse} is not a multiple of {fine}"
            )
    aggs = []
    for m in metrics:
        src = exprs[m.name]
        agg = F.count(src) if m.kind == "count" else getattr(F, m.kind)(src)
        aggs.append(agg.alias(m.name))
    finest = (
        df.withColumn("bucket_us", time_bucket(F.col(us_col), res[0]))
        .groupBy("bucket_us", *group_cols)
        .agg(*aggs)
    )
    # every coarser level reaggregates the PREVIOUS level (mergeable
    # aggregates only): count partials merge by summing
    merge_aggs = []
    for m in metrics:
        fn = F.sum if m.kind in ("sum", "count") else getattr(F, m.kind)
        merge_aggs.append(fn(m.name).alias(m.name))
    levels = [finest.withColumn("resolution_sec", F.lit(res[0]))]
    prev = finest
    for r in res[1:]:
        step = (
            prev.withColumn("bucket_us", time_bucket(F.col("bucket_us"), r))
            .groupBy("bucket_us", *group_cols)
            .agg(*merge_aggs)
        )
        levels.append(step.withColumn("resolution_sec", F.lit(r)))
        prev = step
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out.select("resolution_sec", "bucket_us", *group_cols,
                      *[m.name for m in metrics])
