"""Attribute & metric registries (reference A10/Q4: ``attribute_info`` with
per-attribute ``unnest`` flags, ``dash_app/dash_app.py:278-383``, and
``metric_info`` calculation registry, ``384-409``).

Instead of SQL-string templates, each attribute resolves to a ``Column``
and each metric to an aggregate ``Column`` — the registry is the only
dataset-specific part of the MetricQuery engine.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from magi_etl_spark.functions.text import tokens
from magi_etl_spark.tables import load_table


@dataclass(frozen=True)
class AttributeSpec:
    name: str
    col: Callable[[], Column]  # pre-explode source column
    unnest: bool = False  # True => array attribute, exploded for grouping


@dataclass(frozen=True)
class MetricSpec:
    name: str
    agg: Callable[[], Column]  # aggregate expression, aliased by caller


@dataclass(frozen=True)
class MetricDataset:
    """A queryable dataset: base loader + its attribute/metric registries."""

    name: str
    load: Callable[[SparkSession, str], DataFrame]
    attributes: dict[str, AttributeSpec]
    metrics: dict[str, MetricSpec]


def _cents(c: Column) -> Column:
    return F.round(c * 100).cast("long")


APPROX_DISTINCT_CONF = "spark.magi.approxDistinct"


def count_distinct_scaled(*cols: Column | str) -> Column:
    """Exact countDistinct by default; switches to HyperLogLog
    ``approx_count_distinct`` when the session sets
    ``spark.magi.approxDistinct=true`` (SURVEY.md §4.3.4: the 100 TB
    opt-in — exact distinct counts are the dominant shuffle at scale)."""
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    use_approx = (
        spark is not None
        and spark.conf.get(APPROX_DISTINCT_CONF, "false").lower() == "true"
    )
    if use_approx:
        first, *rest = cols
        target = F.concat_ws("", first, *rest) if rest else first
        return F.approx_count_distinct(target)
    return F.countDistinct(*cols)


def _events_load(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.withColumn("day", F.to_date("ts"))


EVENTS_DATASET = MetricDataset(
    name="events",
    load=_events_load,
    attributes={
        "event_type": AttributeSpec("event_type", lambda: F.col("event_type")),
        "day": AttributeSpec("day", lambda: F.col("day")),
        "k_bucket": AttributeSpec(
            "k_bucket",
            lambda: (F.get_json_object("props", "$.k").cast("long") % 10).cast("string"),
        ),
    },
    metrics={
        "users": MetricSpec("users", lambda: count_distinct_scaled("user_id")),
        "events_cnt": MetricSpec("events_cnt", lambda: F.count("*")),
        "value_c": MetricSpec("value_c", lambda: F.sum(_cents(F.col("value")))),
    },
)


def _documents_load(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.withColumn("token", tokens(F.col("text")))


DOCUMENTS_DATASET = MetricDataset(
    name="documents",
    load=_documents_load,
    attributes={
        "lang": AttributeSpec("lang", lambda: F.col("lang")),
        "source": AttributeSpec("source", lambda: F.col("source")),
        # unnest attribute: exploded for grouping, array-containment in filters
        "token": AttributeSpec("token", lambda: F.col("token"), unnest=True),
    },
    metrics={
        "docs": MetricSpec("docs", lambda: F.countDistinct("doc_id")),
        "rows_cnt": MetricSpec("rows_cnt", lambda: F.count("*")),
        "total_chars": MetricSpec("total_chars", lambda: F.sum("n_chars")),
    },
)

DATASETS: dict[str, MetricDataset] = {
    EVENTS_DATASET.name: EVENTS_DATASET,
    DOCUMENTS_DATASET.name: DOCUMENTS_DATASET,
}
