"""magi_etl_spark — a PySpark-native analytics engine.

A brand-new engine providing the query and data-processing capabilities of
the reference BI/ETL orchestrator (nickearl/magi-etl, surveyed in SURVEY.md),
re-expressed Spark-first: declarative DataFrame/SQL plans optimized by
Catalyst + AQE, with a small library of engine services the optimizer does
not provide (filter-tree compilation, metric registries, result
materialization with config-hash keys, calendar anchoring).

Layout:
    session.py     SparkSession factory tuned for the target cluster
    tables.py      source table loaders / temp-view registration
    calendar.py    AnchorCalendar (injectable anchor date)
    filters.py     recursive filter-group tree -> Column compiler
    metrics.py     attribute & metric registries
    query.py       MetricQuery: dynamic dims/metrics/filters -> DataFrame
    cache.py       result materialization keyed by config hash, TTL + locks
    functions/     scalar/array/vector function parity pack
    operators/     dedup, similarity, text analysis, top-k, sessionize, upsert
    pipelines/     trending / wiki-metadata / monetization dataflows
    queries/       driver-facing query inventory with DuckDB oracles
    streaming/     Structured Streaming extension for the events table
"""

__version__ = "0.1.0"
