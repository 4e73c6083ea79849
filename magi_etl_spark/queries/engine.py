"""Engine-layer query inventory: MetricQuery (dynamic dims/metrics/filter
trees) demonstrated over the generic tables.  The oracle SQL is the
hand-expanded equivalent of what the filter-tree compiler + registry
produce — exactly the shape the reference's ``build_query`` emits as a
Presto string (``dash_app/dash_app.py:1140-1258``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from magi_etl_spark.config import FilterGroup, MetricQueryConfig
from magi_etl_spark.queries import query
from magi_etl_spark.query import metric_query


@query(
    "q30_metric_query_events",
    oracle="""
    SELECT * FROM (
        SELECT event_type,
               CAST(ts AS DATE) AS day,
               COUNT(DISTINCT user_id) AS users,
               COUNT(*) AS events_cnt,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS value_c
        FROM events
        WHERE ((lower(event_type) = lower('purchase')
                OR lower(event_type) = lower('view')
                OR lower(event_type) = lower('click'))
               AND (NOT (lower(event_type) = lower('click'))))
        GROUP BY event_type, day
    ) WHERE users >= 5
    """,
)
def q30_metric_query_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MetricQuery over events: nested include/exclude filter tree, two
    dims, three metrics, min-metric cutoff (reference Q4/Q5/P7/P8)."""
    cfg = MetricQueryConfig(
        dataset="events",
        dimensions=["event_type", "day"],
        metrics=["users", "events_cnt", "value_c"],
        filter_groups=[
            FilterGroup(
                attribute="event_type",
                values=["purchase", "view", "click"],
                logical_operator="or",
                subgroups=[
                    FilterGroup(
                        attribute="event_type", values=["click"], exclude=True
                    )
                ],
            )
        ],
        min_metric="users",
        min_count=5,
    )
    return metric_query(spark, sf_dir, cfg)


@query(
    "q31_metric_query_unnest",
    oracle=r"""
    WITH base AS (
        SELECT doc_id, n_chars,
               list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS toks
        FROM documents
        WHERE (lower(lang) = lower('en') OR lower(lang) = lower('de'))
          AND len(list_intersect(toks, ['the', 'data'])) > 0
    ),
    exploded AS (
        SELECT doc_id, n_chars, trim(unnest(toks)) AS token
        FROM base WHERE len(toks) > 0
    )
    SELECT * FROM (
        SELECT token,
               COUNT(DISTINCT doc_id) AS docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM exploded GROUP BY token
    ) WHERE docs >= 10
    """,
)
def q31_metric_query_unnest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MetricQuery with an unnest dimension: array-containment filter leaf
    (reference P9), pre-explode cardinality guard (P10), cross-join-unnest
    grouping (J6/Q4) — over the documents token array."""
    cfg = MetricQueryConfig(
        dataset="documents",
        dimensions=["token"],
        metrics=["docs", "total_chars"],
        filter_groups=[
            FilterGroup(attribute="lang", values=["en", "de"], logical_operator="or"),
            FilterGroup(attribute="token", values=["the", "data"], logical_operator="or"),
        ],
        min_metric="docs",
        min_count=10,
    )
    return metric_query(spark, sf_dir, cfg)
