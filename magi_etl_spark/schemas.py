"""Explicit StructType schemas for every source relation (SURVEY.md §1.3:
the reference infers everything and re-coerces defensively at 10+ sites —
we declare schemas once and validate at the edge).

Group 1 mirrors the driver-generated generic tables; group 2 the
magi-domain relations (FIXTURES.md).  ``conform`` casts/reorders an
incoming DataFrame to a declared schema, failing loudly on missing
columns instead of silently inferring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _struct(*fields: tuple[str, T.DataType]) -> T.StructType:
    return T.StructType([T.StructField(n, t, True) for n, t in fields])


CONFIDENCE_VALUE = T.ArrayType(
    T.StructType(
        [
            T.StructField("confidence", T.DoubleType()),
            T.StructField("value", T.StringType()),
        ]
    )
)

# -- group 1: generic tables (TESTDATA.md) ---------------------------------

LINEITEM = _struct(
    ("l_orderkey", T.LongType()), ("l_partkey", T.LongType()),
    ("l_suppkey", T.LongType()), ("l_linenumber", T.IntegerType()),
    ("l_quantity", T.DoubleType()), ("l_extendedprice", T.DoubleType()),
    ("l_discount", T.DoubleType()), ("l_tax", T.DoubleType()),
    ("l_returnflag", T.StringType()), ("l_linestatus", T.StringType()),
    # one timestamp contract engine-wide: load_table normalizes naive
    # (NTZ) parquet timestamps to TIMESTAMP under the UTC session, so
    # values equal the naive wall-clock the DuckDB oracles see
    ("l_shipdate", T.TimestampType()),
)
EVENTS = _struct(
    # ts is TIMESTAMP regardless of source unit: epoch-nanos longs go
    # through timestamp_micros, micro/milli NTZ is cast under UTC
    ("event_id", T.LongType()), ("ts", T.TimestampType()),
    ("user_id", T.LongType()), ("event_type", T.StringType()),
    ("value", T.DoubleType()), ("props", T.StringType()),
)
DOCUMENTS = _struct(
    ("doc_id", T.LongType()), ("text", T.StringType()),
    ("lang", T.StringType()), ("source", T.StringType()),
    ("n_chars", T.LongType()),
)
EMBEDDINGS = _struct(
    ("vec_id", T.LongType()),
    ("embedding", T.ArrayType(T.FloatType())),
    ("label", T.IntegerType()),
)

# -- group 2: magi-domain relations (FIXTURES.md §2) -----------------------

ANALYTICS_EVENTS = _struct(
    ("year", T.StringType()), ("month", T.StringType()), ("day", T.StringType()),
    ("brand", T.StringType()), ("platform", T.StringType()),
    ("wiki_id", T.DoubleType()),  # intentionally float-polluted
    ("content_id", T.StringType()), ("page_url", T.StringType()),
    ("analytics_id", T.LongType()), ("device_id", T.StringType()),
    ("session_id", T.StringType()), ("event_type", T.StringType()),
    ("event_time", T.StringType()),  # string on purpose: try_cast at use
    ("pageviews", T.LongType()), ("country", T.StringType()),
)
TAXONOMY = _struct(
    ("content_ids", T.MapType(T.StringType(), T.StringType())),
    ("url", T.StringType()),
    ("site_all_verticals", CONFIDENCE_VALUE), ("site_all_genres", CONFIDENCE_VALUE),
    ("site_all_subgenres", CONFIDENCE_VALUE), ("site_all_themes", CONFIDENCE_VALUE),
    ("site_all_franchises", T.ArrayType(T.StringType())),
    ("page_all_verticals", CONFIDENCE_VALUE), ("page_all_genres", CONFIDENCE_VALUE),
    ("page_all_subgenres", CONFIDENCE_VALUE), ("page_all_themes", CONFIDENCE_VALUE),
    ("page_main_entity_type", CONFIDENCE_VALUE),
    ("page_all_installment_ids", CONFIDENCE_VALUE),
    ("page_all_installment_types", CONFIDENCE_VALUE),
    ("page_all_installment_titles", CONFIDENCE_VALUE),
    ("page_all_platforms", CONFIDENCE_VALUE),
)
DIMENSION_WIKIS = _struct(
    ("wiki_id", T.LongType()), ("domain", T.StringType()), ("url", T.StringType()),
    ("vertical_name", T.StringType()), ("lang", T.StringType()),
    ("is_kid_wiki", T.IntegerType()), ("is_monetized", T.IntegerType()),
    ("created_at", T.StringType()), ("founding_user_id", T.LongType()),
    ("site", T.StringType()),
)
DIMENSION_USERS = _struct(("user_id", T.LongType()), ("user_name", T.StringType()))
COUNTRY_MAP = _struct(
    ("amplitude_country", T.StringType()), ("acme_country", T.StringType()),
    ("acme_sales_region", T.StringType()),
    ("sales_insights_subcontinent", T.StringType()),
)
IGNORE_LIST = _struct(("wiki_id", T.StringType()), ("reason", T.StringType()))

MAGI_SCHEMAS: dict[str, T.StructType] = {
    "analytics_events": ANALYTICS_EVENTS,
    "taxonomy": TAXONOMY,
    "dimension_wikis": DIMENSION_WIKIS,
    "dimension_users": DIMENSION_USERS,
    "country_map": COUNTRY_MAP,
    "ignore_list": IGNORE_LIST,
}


def conform(df: DataFrame, schema: T.StructType) -> DataFrame:
    """Cast + reorder to the declared schema; missing columns are an
    error, extra columns are dropped (explicit beats inferred)."""
    missing = [f.name for f in schema.fields if f.name not in df.columns]
    if missing:
        raise ValueError(f"missing columns: {missing}")
    return df.select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in schema.fields]
    )
