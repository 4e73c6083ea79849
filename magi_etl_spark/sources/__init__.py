"""Source connectors behind one interface (SURVEY.md §2.1).

Local columnar formats are first-class Spark reads; remote/API sources
(REST, Sheets, warehouses) are driver-side fetches with *injectable*
transports so pipelines are testable offline — the reference hardwires
boto3/googleapiclient/requests (``connectors.py``); here the I/O edge is a
callable parameter and the dataframe plumbing is the engine's.
"""

from __future__ import annotations

import os
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_csv(spark: SparkSession, path: str, schema: str | None = None) -> DataFrame:
    """CSV scan (reference S6/S11 ``get_from_s3``/``pd.read_csv``,
    ``connectors.py:126``).  Explicit schema preferred; header inference
    otherwise."""
    reader = spark.read.option("header", True)
    if schema:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def read_jdbc(
    spark: SparkSession, url: str, query: str, properties: dict[str, str] | None = None
) -> DataFrame:
    """Warehouse scan via JDBC (reference S5 Redshift cursor,
    ``connectors.py:64-84``).  Predicate pushdown happens through the
    ``query`` dbtable; partitioned reads via properties."""
    reader = spark.read.format("jdbc").option("url", url).option("query", query)
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader.load()


def read_bigquery(
    spark: SparkSession, table: str, options: dict[str, str] | None = None
) -> DataFrame:
    """BigQuery scan (reference S4 ``QueryBigQuery``, ``connectors.py:
    50-62``) via the spark-bigquery connector when it's on the classpath;
    raises a clear error otherwise (the connector jar isn't bundled
    here)."""
    reader = spark.read.format("bigquery").option("table", table)
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    try:
        return reader.load()
    except Exception as e:  # connector jar absent in this environment
        raise RuntimeError(
            "BigQuery connector not available; add the spark-bigquery "
            "connector jar to the session (--packages "
            "com.google.cloud.spark:spark-bigquery-with-dependencies...)"
        ) from e


def read_rest(
    spark: SparkSession,
    fetch: Callable[[], dict],
    records_key: str,
    schema: str,
) -> DataFrame:
    """REST API source (reference S7 ``QueryRestApi.run_query``,
    ``connectors.py:152-179``): driver-side fetch, records list ->
    DataFrame with an explicit schema (no pandas inference)."""
    payload = fetch()
    records = payload.get(records_key, [])
    return spark.createDataFrame(records, schema=schema)


def read_sheet(
    spark: SparkSession,
    fetch_values: Callable[[], Sequence[Sequence[str]]],
    promote_header: bool = True,
) -> DataFrame:
    """Spreadsheet A1-range source (reference S9 ``read_sheet``,
    ``dash_app/tasks.py:1636-1654``): raw string grid, first row promoted
    to column names (``df.columns = df.iloc[0]; df = df[1:]``)."""
    rows = [list(r) for r in fetch_values()]
    if not rows:
        return spark.createDataFrame([], "value string")
    width = max(len(r) for r in rows)
    rows = [r + [""] * (width - len(r)) for r in rows]
    if promote_header:
        header, data = rows[0], rows[1:]
        names = [c.strip() or f"c{i}" for i, c in enumerate(header)]
    else:
        names, data = [f"c{i}" for i in range(width)], rows
    schema = ", ".join(f"`{n}` string" for n in names)
    return spark.createDataFrame([tuple(r) for r in data], schema)


def read_search_console(
    spark: SparkSession,
    fetch_page: Callable[[dict], dict],
    *,
    start_date: str,
    end_date: str,
    dimensions: Sequence[str] = ("page", "date", "query"),
    row_limit: int = 25_000,
    max_pages: int = 10_000,
) -> DataFrame:
    """Search-Console-style paginated source (reference S8
    ``SearchData.get_search_data``, ``connectors.py:489-534``).

    Offset pagination: page ``i`` requests ``startRow = i * row_limit``
    and the loop stops at the first page with no rows (the reference's
    ``while True`` / ``response.get("rows")`` contract); the API's
    ``keys`` list column is then split into one column per requested
    dimension — engine-side ``element_at`` — with the ``date`` dimension
    parsed to a real date and ``keys`` dropped.  ``fetch_page`` is the
    injected transport (payload -> response dict) so the source is
    testable offline.  The API edge is driver-side by nature (offset
    pagination is sequential); everything after the fetch is a Spark
    plan, and ``max_pages`` bounds a misbehaving endpoint.
    """
    rows: list[dict] = []
    for i in range(max_pages):
        payload = {
            "startDate": start_date,
            "endDate": end_date,
            "dimensions": list(dimensions),
            "rowLimit": row_limit,
            "startRow": i * row_limit,
        }
        got = fetch_page(payload).get("rows") or []
        if not got:
            break
        rows.extend(got)
    schema = (
        "keys array<string>, clicks double, impressions double, "
        "ctr double, position double"
    )
    df = spark.createDataFrame(
        [
            (
                list(r.get("keys", [])),
                r.get("clicks"),
                r.get("impressions"),
                r.get("ctr"),
                r.get("position"),
            )
            for r in rows
        ],
        schema,
    )
    dim_cols = []
    for j, d in enumerate(dimensions):
        c = F.try_element_at("keys", F.lit(j + 1))
        dim_cols.append((F.to_date(c) if d == "date" else c).alias(d))
    return df.select(*dim_cols, "clicks", "impressions", "ctr", "position")


def coerce_numeric(df: DataFrame, cols: list[str]) -> DataFrame:
    """Numeric coercion for sheet extracts: strips thousands separators
    and try_casts (reference's ad-hoc ``str.replace(',','')`` +
    ``astype``)."""
    for c in cols:
        df = df.withColumn(
            c, F.expr(f"try_cast(regexp_replace(`{c}`, ',', '') as double)")
        )
    return df


def dryrun_path(cache_dir: str, name: str) -> str | None:
    """DRYRUN replay (reference ``tasks.py:35``, ``2104-2120``): return the
    cached result path if present, else None — callers substitute the
    cached scan for the compute."""
    p = os.path.join(cache_dir, f"{name}.parquet")
    if os.path.exists(p):
        return p
    csv = os.path.join(cache_dir, f"{name}.csv")
    return csv if os.path.exists(csv) else None
