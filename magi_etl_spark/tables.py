"""Source table access.

The reference reads remote catalog tables by name through Athena
(``AwsDataCatalog.<db>.<table>``, reference ``connectors.py:182-253``); our
catalog is parquet-at-rest loaded by name.  Loading stays lazy — Catalyst
prunes columns and pushes filters into the parquet scan, so callers simply
compose on the returned DataFrame.
"""

from __future__ import annotations

import os
from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


@lru_cache(maxsize=256)
def _nanos_timestamp_columns(path: str) -> tuple[str, ...]:
    """Columns stored as parquet TIMESTAMP(NANOS) — Spark rejects these
    (PARQUET_TYPE_ILLEGAL), so they are read as long and converted."""
    import pyarrow.parquet as pq
    import pyarrow as pa

    try:
        schema = pq.read_schema(path)
    except Exception:
        return ()
    return tuple(
        f.name
        for f in schema
        if pa.types.is_timestamp(f.type) and f.type.unit == "ns"
    )


# One analyzed scan per (session, dir, table): repeated load_table calls
# re-read parquet footers and re-build the file index at planning time,
# which dominates per-query fixed overhead when many small queries share
# a session (the bench/correctness loops).  Keyed by applicationId so a
# restarted session never sees a stale plan; the test corpus is
# immutable, so the captured file listing stays valid.
_SCAN_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy parquet scan for one named table.

    Nanosecond timestamps are read as epoch-nanos longs and truncated to
    Spark's micro precision with *integer* division (`div`) — floating
    division would lose precision on epoch-scale int64s.
    """
    app_id = spark.sparkContext.applicationId
    key = (app_id, sf_dir.rstrip("/"), name)
    cached = _SCAN_CACHE.get(key)
    if cached is not None:
        return cached
    # evict plans belonging to dead sessions — a long-lived process that
    # restarts Spark would otherwise accumulate unreachable DataFrames
    for stale in [k for k in _SCAN_CACHE if k[0] != app_id]:
        del _SCAN_CACHE[stale]
    path = f"{sf_dir.rstrip('/')}/{name}.parquet"
    # Parquet timestamps here are timezone-naive; date/second extraction
    # must match a naive-timestamp oracle even when the caller's session
    # (e.g. the external driver's) was built with a non-UTC local
    # timezone.  The pin CANNOT live only in get_spark(): the driver
    # constructs its own plain session that never passes through our
    # factory, and this loader is the one engine entry point it does
    # use.  get_spark() pins UTC too, so engine-built sessions never
    # reach the override; a foreign session that was deliberately
    # non-UTC gets a warning instead of a silent flip.
    if spark.conf.get("spark.sql.session.timeZone", None) != "UTC":
        import warnings

        warnings.warn(
            "load_table pins spark.sql.session.timeZone=UTC: the parquet "
            "catalog stores naive timestamps and every oracle assumes UTC "
            "calendar extraction",
            stacklevel=2,
        )
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    ns_cols = _nanos_timestamp_columns(path)
    if ns_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in ns_cols:
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    # Micro/milli parquet timestamps arrive as TIMESTAMP_NTZ; normalize to
    # TIMESTAMP (the session runs UTC, so values are unchanged) so the
    # engine exposes ONE timestamp contract regardless of how the source
    # file was written — ns sources land on TIMESTAMP via timestamp_micros
    # above, and watermarks/session windows require a zoned event time.
    from pyspark.sql.types import TimestampNTZType

    for f in df.schema.fields:
        if isinstance(f.dataType, TimestampNTZType):
            df = df.withColumn(f.name, F.col(f.name).cast("timestamp"))
    _SCAN_CACHE[key] = df
    return df


def register_views(spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES) -> None:
    """Register every table as a temp view so SQL-form queries can run."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
