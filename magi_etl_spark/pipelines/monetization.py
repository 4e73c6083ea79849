"""TransformMonetizationMonitor, Spark-first (reference
``dash_app/tasks.py:2538-2911``): unmonetized wikis above a 30-day
pageview floor, minus a maintained ignore list, plus the staleness filter
used to decide which wikis need a metadata refresh.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from magi_etl_spark.calendar import AnchorCalendar


def unmonetized_wikis(
    events: DataFrame,
    dim_wikis: DataFrame,
    anchor_date: dt.date | str,
    threshold: int = 5000,  # reference tasks.py:2573
    brand: str = "acme",
    platform: str = "web",
    window_days: int = 30,
) -> DataFrame:
    """30-day traffic of not-monetized wikis above the pageview floor
    (reference CTE ``unmonetized_wiki_ids_above_min_traffic_threshold``,
    ``tasks.py:2580-2607``).  NULL ``is_monetized`` (wiki missing from the
    dimension) is excluded — ``not (is_monetized = 1)`` NULL semantics
    faithfully kept."""
    cal = AnchorCalendar(anchor_date)
    start_date, end_date = cal.rolling_window(window_days)
    dim = dim_wikis.select(
        F.col("wiki_id").cast("double").alias("dim_wiki_id"), "is_monetized"
    )
    return (
        events.withColumn("d", F.to_date(F.concat_ws("-", "year", "month", "day")))
        .where(
            F.col("d").between(F.lit(start_date), F.lit(end_date))
            & (F.lower("brand") == brand.lower())
            & (F.lower("platform") == platform.lower())
        )
        .join(F.broadcast(dim), F.col("wiki_id") == F.col("dim_wiki_id"), "left")
        .where(~(F.col("is_monetized") == 1))
        .groupBy("wiki_id", "is_monetized")
        .agg(
            F.countDistinct("analytics_id").alias("users"),
            F.countDistinct("session_id").alias("sessions"),
            F.sum("pageviews").alias("pageviews"),
        )
        .where(F.col("pageviews") >= F.lit(threshold))
    )


def apply_ignore_list(df: DataFrame, ignore_list: DataFrame) -> DataFrame:
    """Anti-join exclusion by wiki_id string key (reference J8,
    ``tasks.py:2705``)."""
    ign = ignore_list.select(F.col("wiki_id").cast("string").alias("ign_id")).distinct()
    return df.join(
        F.broadcast(ign),
        F.col("wiki_id").cast("bigint").cast("string") == F.col("ign_id"),
        "left_anti",
    )


def stale_metadata(
    wiki_metadata: DataFrame,
    anchor_date: dt.date | str,
    staleness_days: int = 6,  # reference tasks.py:2155
) -> DataFrame:
    """Rows needing refresh: last_refreshed older than N days before the
    anchor, or missing AI summary (reference refresh-if-stale logic,
    ``tasks.py:2149-2163``, ``2717-2730``)."""
    cutoff = AnchorCalendar(anchor_date).current_date - dt.timedelta(days=staleness_days)
    refreshed = F.expr("try_cast(last_refreshed as timestamp)")
    return wiki_metadata.where(
        refreshed.isNull()
        | (F.to_date(refreshed) < F.lit(cutoff))
        | F.col("ai_summary").isNull()
    )
