"""TransformTrendingWikis, Spark-first.

Replicates the reference's trending CTE chain (``dash_app/tasks.py:
1744-2070``): latest-day traffic vs a 4-same-weekday benchmark per wiki,
threshold floors, global top-K total & percent lists, per-wiki top-K
pages, sessionization, and a daily timeseries for the top wikis.

Documented intent-deviations (SURVEY.md §5.4 / FIXTURES.md):
- the comp-range predicate is ``date IN (d-7,d-14,d-21,d-28) AND brand
  AND platform`` (the reference's OR-precedence slip corrected);
- LIMIT/top-1 picks carry deterministic tie-breaks (name / id ascending)
  where the reference relies on engine ordering luck.

Scale notes: every aggregate is a hash shuffle on (wiki_name[, page]) with
map-side partial aggregation; top-K lists are tiny and re-enter as
broadcast semi-joins; the session join keys on device_session_id.  AQE
handles skewed wikis (a viral wiki is exactly the skew-join case).
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from magi_etl_spark.calendar import AnchorCalendar
from magi_etl_spark.functions.strings import canonical_page_trending, wiki_name_from_url


@dataclass
class TrendingConfig:
    anchor_date: dt.date | str  # AnchorCalendar anchor; latest = anchor-1d
    brand: str = "acme"  # reference tasks.py:1748
    platform: str = "web"
    min_users_total: int = 1000  # tasks.py:1849
    min_users_percent: int = 2000  # tasks.py:1863
    min_page_users: int = 100  # tasks.py:1878 (page-level floor)
    top_k: int = 20
    page_top_k: int = 20
    window_days: int = 30


def _prepared(events: DataFrame, cfg: TrendingConfig) -> DataFrame:
    """Shared projection: partition-date reassembly + brand/platform filter
    (reference ``cast(concat(year,'-',month,'-',day) as date)``,
    ``tasks.py:600``; these predicates push into the scan)."""
    return events.withColumn(
        "d", F.to_date(F.concat_ws("-", "year", "month", "day"))
    ).where(
        (F.lower("brand") == cfg.brand.lower())
        & (F.lower("platform") == cfg.platform.lower())
    ).withColumn("wiki_name", wiki_name_from_url(F.col("page_url")))


def _traffic_aggs() -> list[F.Column]:
    # users / sessions / pageviews triple (reference tasks.py:1758-1762)
    return [
        F.countDistinct("analytics_id").alias("users"),
        F.countDistinct(F.concat_ws("-", "device_id", "session_id")).alias("sessions"),
        F.count(F.when(F.col("event_type").like("pageview"), 1)).alias("pageviews"),
    ]


def _benchmark_metrics(a: DataFrame, b: DataFrame, on: list[str]) -> DataFrame:
    """latest LEFT JOIN comp with the vs-benchmark metric block
    (reference final_wikis / top_pages_*_final, tasks.py:1827-1843)."""
    b_ren = b.select(
        *on,
        F.col("users").alias("users_benchmark"),
        F.col("sessions").alias("sessions_benchmark"),
        F.col("pageviews").alias("pageviews_benchmark"),
    )
    # try_divide: NULL on zero denominator, matching DuckDB/most engines'
    # double division-by-zero -> NULL (ANSI Spark would throw instead)
    pps = F.try_divide(F.lit(1.0) * F.col("pageviews"), F.col("sessions"))
    pps_b = F.try_divide(
        F.lit(1.0) * F.col("pageviews_benchmark"), F.col("sessions_benchmark")
    )
    return (
        a.join(b_ren, on, "left")
        .withColumn("users_total_vs_benchmark", F.col("users") - F.col("users_benchmark"))
        .withColumn(
            "users_percent_vs_benchmark",
            F.try_divide(F.lit(1.0) * F.col("users"), F.col("users_benchmark")) - 1,
        )
        .withColumn("pvs_per_session", pps)
        .withColumn("pvs_per_session_benchmark", pps_b)
        .withColumn("pvs_per_session_total_vs_benchmark", pps - pps_b)
        .withColumn("pvs_per_session_percent_vs_benchmark", F.try_divide(pps, pps_b) - 1)
        .drop("sessions_benchmark", "pageviews_benchmark")
    )


def trending_pipeline(
    events: DataFrame, dim_wikis: DataFrame, cfg: TrendingConfig
) -> dict[str, DataFrame]:
    cal = AnchorCalendar(cfg.anchor_date)
    latest_date, (start_date, end_date) = cal.latest_date, cal.rolling_window(cfg.window_days)
    comp_days = cal.benchmark_days(4)
    base = _prepared(events, cfg)

    latest = (
        base.where(F.col("d") == F.lit(latest_date)).groupBy("wiki_name").agg(*_traffic_aggs())
    )
    comp = (
        base.where(F.col("d").isin([F.lit(x) for x in comp_days]))
        .groupBy("wiki_name")
        .agg(*_traffic_aggs())
        .select(
            "wiki_name",
            (F.lit(1.0) * F.col("users") / 4).alias("users"),
            (F.lit(1.0) * F.col("sessions") / 4).alias("sessions"),
            (F.lit(1.0) * F.col("pageviews") / 4).alias("pageviews"),
        )
    )

    # dominant wiki_id per wiki_name over the 30-day window (W1 top-1 via
    # row_number; tasks.py:1796-1823), vertical from the broadcast dim
    month_window = base.where(F.col("d").between(F.lit(start_date), F.lit(end_date)))
    dim = dim_wikis.select(
        F.col("wiki_id").cast("double").alias("dim_wiki_id"), "vertical_name"
    )
    per_id = (
        month_window.join(F.broadcast(dim), F.col("wiki_id") == F.col("dim_wiki_id"), "left")
        .groupBy("wiki_name", "wiki_id", "vertical_name")
        .agg(F.sum("pageviews").alias("pageviews"))
    )
    w_top = W.partitionBy("wiki_name").orderBy(
        F.desc("pageviews"), F.asc_nulls_last("wiki_id"), F.asc_nulls_last("vertical_name")
    )
    top_wiki_id = (
        per_id.withColumn("rn", F.row_number().over(w_top))
        .where(F.col("rn") == 1)
        .select("wiki_name", "wiki_id", "vertical_name")
    )

    wiki_summary = (
        _benchmark_metrics(latest, comp, ["wiki_name"])
        .join(top_wiki_id, "wiki_name", "left")
        .where(
            F.col("wiki_name").isNotNull()
            & ~F.col("wiki_name").like("%turbopages.org%")
            & (F.col("users") >= cfg.min_users_total)
        )
        .select(
            "wiki_id", "wiki_name", "vertical_name", "users", "users_benchmark",
            "users_total_vs_benchmark", "users_percent_vs_benchmark",
            "pvs_per_session", "pvs_per_session_benchmark",
            "pvs_per_session_total_vs_benchmark", "pvs_per_session_percent_vs_benchmark",
        )
    )

    top_total = (
        wiki_summary.orderBy(F.desc("users_total_vs_benchmark"), "wiki_name")
        .limit(cfg.top_k)
        .select("wiki_name")
    )
    top_percent = (
        wiki_summary.where(F.col("users") >= cfg.min_users_percent)
        .orderBy(F.desc("users_percent_vs_benchmark"), "wiki_name")
        .limit(cfg.top_k)
        .select("wiki_name")
    )

    def page_traffic(day_filter: F.Column, wiki_list: DataFrame, scaled: bool) -> DataFrame:
        df = (
            base.where(day_filter)
            .join(F.broadcast(wiki_list), "wiki_name", "left_semi")
            .withColumn("page", canonical_page_trending(F.col("page_url")))
            .groupBy("wiki_name", "page")
            .agg(*_traffic_aggs())
        )
        if scaled:
            df = df.select(
                "wiki_name", "page",
                (F.lit(1.0) * F.col("users") / 4).alias("users"),
                (F.lit(1.0) * F.col("sessions") / 4).alias("sessions"),
                (F.lit(1.0) * F.col("pageviews") / 4).alias("pageviews"),
            )
        return df

    def top_pages(wiki_list: DataFrame, metric: str) -> DataFrame:
        a = page_traffic(F.col("d") == F.lit(latest_date), wiki_list, scaled=False)
        b = page_traffic(
            F.col("d").isin([F.lit(x) for x in comp_days]), wiki_list, scaled=True
        )
        ranked = (
            _benchmark_metrics(a, b, ["wiki_name", "page"])
            .where(F.col("users") >= cfg.min_page_users)
            .withColumn(
                "rnk",
                F.rank().over(W.partitionBy("wiki_name").orderBy(F.desc(metric))),
            )
        )
        return ranked.where(
            F.col("wiki_name").isNotNull()
            & F.col("page").isNotNull()
            & (F.col("rnk") <= cfg.page_top_k)
        )

    page_total = top_pages(top_total, "users_total_vs_benchmark")
    page_percent = top_pages(top_percent, "users_percent_vs_benchmark")

    # sessionization (A7): per device-session min/max event_time -> duration
    # + hit depth; '-1' sessions excluded (tasks.py:1984-2004)
    ts = F.expr("try_cast(event_time as timestamp)")
    in_window = base.where(F.col("d").between(F.lit(start_date), F.lit(end_date)))
    session_details = (
        in_window.where(
            F.date_trunc("day", ts).between(F.lit(start_date), F.lit(end_date))
            & (F.col("session_id") != "-1")
        )
        .groupBy(
            F.concat_ws("-", "device_id", "session_id").alias("device_session_id"),
            "wiki_name",
        )
        .agg(
            F.greatest(
                F.unix_timestamp(F.max(ts)) - F.unix_timestamp(F.min(ts)), F.lit(0)
            ).alias("session_duration_seconds"),
            F.count("*").alias("hit_depth"),
            F.min("event_time").alias("min_ts"),
        )
        .select("device_session_id", "session_duration_seconds", "hit_depth", "min_ts")
    )

    top_union = top_total.unionByName(top_percent).distinct()
    daily_base = (
        in_window.join(F.broadcast(top_union), "wiki_name", "left_semi")
        .select(
            F.concat_ws("-", "year", "month", "day").alias("date"),
            "wiki_name",
            "analytics_id",
            F.concat_ws("-", "device_id", "session_id").alias("device_session_id"),
            "event_type",
            "event_time",
        )
    )
    wiki_daily = (
        daily_base.join(
            session_details,
            (daily_base.device_session_id == session_details.device_session_id)
            & (daily_base.event_time == session_details.min_ts),
            "left",
        )
        .drop(session_details.device_session_id)
        .groupBy("date", "wiki_name")
        .agg(
            F.countDistinct("analytics_id").alias("users"),
            F.countDistinct("device_session_id").alias("sessions"),
            F.sum(F.when(F.col("event_type") == "pageview", 1)).alias("pageviews"),
            F.sum("session_duration_seconds").alias("session_duration_seconds"),
            F.sum(F.when(F.col("hit_depth") == 1, 1)).alias("bounces"),
        )
        .where(F.col("wiki_name").isNotNull())
    )

    return {
        "wiki_summary": wiki_summary,
        "page_total": page_total,
        "page_percent": page_percent,
        "wiki_daily": wiki_daily,
    }
