"""MetricQuery — the engine's most general operator.

Replicates the reference's dynamic-attribute query generation
(``generate_dynamic_attribute_cte``, reference ``dash_app/dash_app.py:
1183-1245``) as a declarative DataFrame composition Catalyst can optimize
end-to-end:

    base scan -> filter-tree Column -> pre-explode cardinality guard ->
    explode per unnest dim (trimmed) -> groupBy(dims).agg(metrics) ->
    min-metric cutoff -> order by first metric desc [-> limit]

Scale notes: filters are applied before any explode (row-count of the
generate stage shrinks first), the aggregate is hash-partitioned on the
grouped dims with map-side partial aggregation, and nothing here forces a
collect — the result is a plan, materialization is the caller's choice
(see cache.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from magi_etl_spark.config import MetricQueryConfig
from magi_etl_spark.filters import compile_filter_tree
from magi_etl_spark.metrics import DATASETS, MetricDataset


def metric_query(
    spark: SparkSession,
    sf_dir: str,
    config: MetricQueryConfig,
    dataset: MetricDataset | None = None,
) -> DataFrame:
    ds = dataset or DATASETS[config.dataset]
    for d in config.dimensions:
        if d not in ds.attributes:
            raise ValueError(f"unsupported attribute: {d}")
    metric_names = config.metrics or list(ds.metrics)
    for m in metric_names:
        if m not in ds.metrics:
            raise ValueError(f"unsupported metric: {m}")

    df = ds.load(spark, sf_dir)
    df = df.where(compile_filter_tree(config.filter_groups, ds.attributes))

    unnest_dims = [d for d in config.dimensions if ds.attributes[d].unnest]
    # pre-explode guard: cardinality(col) > 0 per unnest attribute
    # (reference dash_app/dash_app.py:1221; intent of the joined-cardinality
    # template, applied per attribute)
    for d in unnest_dims:
        df = df.where(F.size(ds.attributes[d].col()) > 0)
    # cross join unnest => chained explodes; values trimmed like the
    # reference's `trim({attribute}_value)` (dash_app/dash_app.py:1199)
    dim_cols = []
    for d in config.dimensions:
        spec = ds.attributes[d]
        if spec.unnest:
            df = df.withColumn(f"__dim_{d}", F.explode(spec.col()))
            dim_cols.append(F.trim(F.col(f"__dim_{d}")).alias(d))
        else:
            dim_cols.append(spec.col().alias(d))

    aggs = [ds.metrics[m].agg().alias(m) for m in metric_names]
    out = df.groupBy(*dim_cols).agg(*aggs) if dim_cols else df.agg(*aggs)

    if config.min_count and config.min_metric:
        out = out.where(F.col(config.min_metric) >= F.lit(config.min_count))
    if config.dimensions:
        # order by first metric desc (reference dash_app/dash_app.py:1227),
        # dims appended for a deterministic total order
        out = out.orderBy(F.desc(metric_names[0]), *config.dimensions)
    if config.limit is not None:
        out = out.limit(config.limit)
    return out
