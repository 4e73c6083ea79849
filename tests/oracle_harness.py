"""Local replica of the driver's DuckDB-oracle comparison.

Mirrors the documented compare semantics: sort columns by name, sort rows,
round floats to 6 dp, then compare values cell by cell.  Running this at
sf0.001 in the test suite keeps the sf0.01 driver gate honest.
"""

from __future__ import annotations

import math
from datetime import date, datetime

import duckdb

from magi_etl_spark.tables import TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # canonicalize -0.0: it compares == 0.0 but stringifies "-0.0",
        # which would misalign the sorted-row pairing
        return round(v, 6) + 0.0
    if isinstance(v, datetime):
        return v.isoformat()
    if isinstance(v, date):
        return v.isoformat()
    # numpy scalars / Decimal / ints
    try:
        import numpy as np

        if isinstance(v, np.floating):
            return round(float(v), 6)
        if isinstance(v, np.integer):
            return int(v)
    except ImportError:
        pass
    return v

def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return [c for c in sorted(cols)], out


def _dtype_kind_mismatches(spark_df, con, sql) -> list[str]:
    """Typed-frame channel check (r5 VERDICT item 2b): a ``fetchall()``
    cell compare sees DuckDB HUGEINT ``123`` == Spark ``123``, but a
    driver that hashes TYPED frames fetches HUGEINT as float64 and sees
    ``123.0`` vs ``123`` — exactly how q89 failed two rounds while the
    local harness stayed green.  Compare pandas dtype KINDS between
    ``spark_df.toPandas()`` and DuckDB ``fetchdf()`` for the numeric/bool
    kinds; columns containing nulls are skipped (both engines degrade
    nullable ints to float64/object at their own discretion, which is a
    shared fetch artifact, not an oracle defect)."""
    import pandas as pd  # noqa: F401

    sp = spark_df.toPandas()
    dp = con.execute(sql).fetchdf()
    strict = set("iufb")
    bad: list[str] = []
    for col in sp.columns:
        if col not in dp.columns:
            continue
        sk, dk = sp[col].dtype.kind, dp[col].dtype.kind
        if sk == dk or sk not in strict or dk not in strict:
            continue
        if sp[col].isna().any() or dp[col].isna().any():
            continue
        bad.append(f"{col}: spark dtype kind {sk!r} vs duckdb {dk!r}")
    return bad


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> tuple[bool, str]:
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = con.execute(sql)
    d_cols = [d[0] for d in rel.description]
    d_rows = rel.fetchall()
    sc, sr = _norm_rows(s_cols, s_rows)
    dc, dr = _norm_rows(d_cols, d_rows)
    if sc != dc:
        return False, f"column mismatch: spark={sc} duckdb={dc}"
    if len(sr) != len(dr):
        return False, f"row count mismatch: spark={len(sr)} duckdb={len(dr)}"
    for i, (a, b) in enumerate(zip(sr, dr)):
        if a != b:
            return False, f"row {i} mismatch:\n  spark={a}\n  duck ={b}"
    kind_bad = _dtype_kind_mismatches(spark_df, con, sql)
    if kind_bad:
        return False, "typed-frame dtype mismatch (driver hash channel): " + "; ".join(
            kind_bad
        )
    return True, f"ok ({len(sr)} rows)"
