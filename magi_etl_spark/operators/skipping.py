"""Storage-layout pruning: file-level min/max data skipping and
dynamic partition pruning (DPP).

The z-order family (operators/zorder.py, q85) proved footer-stats
pruning for multi-column predicates; these two operators complete the
layout toolbox with the single-column workhorses every lakehouse table
format (Delta / Iceberg / Hudi) is built on:

- ``write_with_stats`` / ``pruned_read`` — range-partition a table on
  a sort key into N files and keep a min/max STATS SIDECAR per file
  (the manifest idiom).  A range predicate then opens ONLY the files
  whose [min, max] interval overlaps the query range — at 100 TB this
  is the difference between scanning a shard and scanning the lake.
  The pruning decision happens on the sidecar (a tiny JSON manifest),
  not by listing data; correctness does not depend on it (the exact
  predicate is re-applied after the file cut, so a stale-but-superset
  manifest still returns exact results).
- ``dpp_join`` — the runtime counterpart: a directory-partitioned fact
  joined to a filtered dimension lets Spark inject the dim's key set
  into the fact scan's PartitionFilters at RUNTIME (the
  ``dynamicpruning#`` subquery).  ``dpp_plan`` exposes the compiled
  plan so callers (and the gate query) can assert the injection
  actually happened.
"""

from __future__ import annotations

import datetime as _dt
import decimal
import json
import os
import re
import zoneinfo

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


# sort-key type categories the manifest records; bound comparison happens
# in the key's NATIVE ordering, never on str()-ified values (the r7 ADVICE
# defect: lexicographic '10' < '9' silently gave a numeric key string-range
# semantics in both the file cut and the returned rows)
_NUMERIC = {"byte", "short", "int", "integer", "long", "bigint", "float",
            "double", "decimal"}
_ISO_SORTABLE = {"string", "date", "timestamp", "timestamp_ntz"}


def _key_kind(dtype: str) -> str:
    base = dtype.split("(")[0].lower()
    if base in _NUMERIC:
        return "numeric"
    if base in _ISO_SORTABLE:
        return "iso"
    raise TypeError(
        f"write_with_stats sort key has unsupported type {dtype!r}: min/max "
        "skipping needs a totally ordered key (numeric, string, date or "
        "timestamp)"
    )


def write_with_stats(
    df: DataFrame,
    path: str,
    sort_col: str,
    n_files: int = 8,
) -> dict:
    """Write ``df`` range-partitioned on ``sort_col`` into ``n_files``
    parquet files plus a ``_stats.json`` sidecar recording each file's
    min/max of the sort key.  Returns the manifest.

    The manifest records the key's type KIND and BASE type alongside the
    bounds: numeric keys store native JSON numbers — except decimal
    keys, whose bounds serialize as ``str(v)`` so fractional digits are
    never truncated (the r8 ADVICE defect: ``int(Decimal('123.45'))``
    recorded ``hi=123``, silently skipping files for in-range
    predicates) — and read-side comparison goes through
    ``decimal.Decimal`` so bigints beyond 2**53 stay exact too.
    Date/timestamp bounds are canonicalized through ``fromisoformat`` on
    BOTH the write and read sides, so the ``'T'``-vs-space separator
    difference between ``isoformat()`` and ``str(datetime)`` can never
    flip a lexicographic comparison (the r8 ADVICE medium) — and they
    are rendered by SPARK (``cast(string)``, session-timezone wall
    time), never by Python's OS-local ``datetime.fromtimestamp``: with
    the session pinned to UTC and the OS on another zone, a
    Python-collected bound is shifted by the zone offset relative to
    the query literal's session-frame interpretation, and the file cut
    silently drops in-range files (caught by the dual-TZ suite under
    TZ=America/New_York).  Plain string keys compare lexicographically
    as-is.  Other key types raise — the contract is validated, not left
    to a docstring aside."""
    dtype = dict(df.dtypes)[sort_col]
    kind = _key_kind(dtype)
    base = dtype.split("(")[0].lower()
    (
        df.repartitionByRange(n_files, F.col(sort_col))
        .write.mode("overwrite")
        .parquet(path)
    )
    back = df.sparkSession.read.parquet(path)
    # temporal bounds cross the collect() boundary as session-frame
    # STRINGS; numeric/plain-string bounds are frame-free and collect
    # natively
    temporal = base in {"timestamp", "timestamp_ntz", "date"}
    lo_c = F.min(sort_col).cast("string") if temporal else F.min(sort_col)
    hi_c = F.max(sort_col).cast("string") if temporal else F.max(sort_col)
    stats = (
        back.groupBy(F.input_file_name().alias("file"))
        .agg(
            lo_c.alias("lo"),
            hi_c.alias("hi"),
            F.count("*").alias("rows"),
        )
        .collect()
    )

    def _bound(v):
        if kind == "numeric":
            if isinstance(v, bool):  # guard: bool is an int subclass
                raise TypeError("boolean sort keys are not skippable")
            if isinstance(v, int):
                return v  # exact (JSON ints are arbitrary precision)
            if isinstance(v, float):
                return v
            return str(v)  # Decimal: keep every fractional digit
        return v.isoformat() if hasattr(v, "isoformat") else str(v)

    manifest = {
        "sort_col": sort_col,
        "kind": kind,
        "base": base,
        "files": [
            {"file": r.file, "lo": _bound(r.lo), "hi": _bound(r.hi),
             "rows": r.rows}
            for r in stats
        ],
    }
    with open(os.path.join(path, "_stats.json"), "w") as f:
        json.dump(manifest, f)
    return manifest


def _session_zone(spark: SparkSession) -> _dt.tzinfo:
    """The tzinfo ``spark.sql.session.timeZone`` names.  Spark accepts
    region ids AND fixed-offset ids ("+08:00", "-0530", "GMT+8",
    "UTC+2") — ``zoneinfo`` only knows the former and raises on the
    rest (the r10 ADVICE defect: pruned_read with aware bounds crashed
    in offset-zone sessions), so offset-style ids parse into a
    ``datetime.timezone`` with the same fixed offset the JVM resolves
    them to."""
    zid = spark.conf.get("spark.sql.session.timeZone")
    try:
        return zoneinfo.ZoneInfo(zid)
    except Exception:
        m = re.fullmatch(
            r"(?:UTC|UT|GMT)?([+-])(\d{1,2})(?::?(\d{2}))?(?::?(\d{2}))?",
            zid,
        )
        if m is None:
            raise
        sign = 1 if m.group(1) == "+" else -1
        return _dt.timezone(
            sign
            * _dt.timedelta(
                hours=int(m.group(2)),
                minutes=int(m.group(3) or 0),
                seconds=int(m.group(4) or 0),
            )
        )


def pruned_read(
    spark: SparkSession,
    path: str,
    lo,
    hi,
) -> tuple[DataFrame, int, int]:
    """Read only the files whose [min, max] overlaps ``[lo, hi]``, then
    re-apply the exact predicate.  Bounds compare in the key's native
    order: via ``decimal.Decimal`` for numeric keys (exact for bigints
    past 2**53 and for decimal fractions; ``lo``/``hi`` may arrive as
    strings and are parsed), via ``fromisoformat`` for date/timestamp
    keys (so ``'T'`` and space separators compare identically),
    lexicographically for plain strings.  Temporal bounds are SESSION-
    TIMEZONE wall times end to end: a naive datetime or string means a
    session-frame wall time, an aware datetime is converted to the
    zone ``spark.sql.session.timeZone`` actually names (never an
    assumed UTC), and the row predicate is built from the canonical ISO
    string so Spark's session-frame string→timestamp cast interprets
    it — never ``F.lit(datetime)``, whose embedding goes through the
    OS-local zone.  The row predicate casts the BOUNDS to the column's
    type — never the column to string.  Returns
    ``(frame, n_files_read, n_files_total)``."""
    with open(os.path.join(path, "_stats.json")) as f:
        manifest = json.load(f)
    kind = manifest.get("kind", "iso")
    base = manifest.get("base", "string")
    if kind == "numeric":
        def _num(x):
            return decimal.Decimal(str(x))

        lo_v, hi_v = _num(lo), _num(hi)
        bounds = [(_num(e["lo"]), _num(e["hi"])) for e in manifest["files"]]
    elif base in {"timestamp", "timestamp_ntz", "date"}:
        # the ACTUAL session zone, not an assumed UTC (the r9 ADVICE
        # defect: astimezone(utc) hardcoded the session frame, so a
        # non-UTC session shifted aware bounds by the zone offset and
        # silently dropped in-range files)
        sess_zone = _session_zone(spark)

        def _ts(x):
            # py>=3.11 fromisoformat accepts both 'T' and ' ' separators,
            # with or without a time component — one canonical ordering
            # for datetime objects, isoformat strings and SQL-style
            # strings alike.  Naive datetimes/strings mean SESSION-frame
            # wall times; aware datetimes convert to the session zone
            # and drop tzinfo.
            if isinstance(x, _dt.datetime):
                if x.tzinfo is not None:
                    return x.astimezone(sess_zone).replace(tzinfo=None)
                return x
            if isinstance(x, _dt.date):
                return _dt.datetime(x.year, x.month, x.day)
            d = _dt.datetime.fromisoformat(str(x))
            if d.tzinfo is not None:
                return d.astimezone(sess_zone).replace(tzinfo=None)
            return d

        lo_v, hi_v = _ts(lo), _ts(hi)
        bounds = [(_ts(e["lo"]), _ts(e["hi"])) for e in manifest["files"]]
    else:
        lo_v, hi_v = str(lo), str(hi)
        bounds = [(str(e["lo"]), str(e["hi"])) for e in manifest["files"]]
    keep = [
        e["file"]
        for e, (b_lo, b_hi) in zip(manifest["files"], bounds)
        if not (b_hi < lo_v or b_lo > hi_v)
    ]
    total = len(manifest["files"])
    sc = manifest["sort_col"]
    df = spark.read.parquet(*keep) if keep else spark.read.parquet(path).limit(0)
    col_t = dict(df.dtypes)[sc]
    if base in {"timestamp", "timestamp_ntz", "date"}:
        # session-frame string → column type; F.lit(datetime) would
        # embed through the OS-local zone instead
        lo_lit = F.lit(lo_v.isoformat(sep=" ")).cast(col_t)
        hi_lit = F.lit(hi_v.isoformat(sep=" ")).cast(col_t)
    else:
        lo_lit = F.lit(lo).cast(col_t)
        hi_lit = F.lit(hi).cast(col_t)
    return (
        df.where((F.col(sc) >= lo_lit) & (F.col(sc) <= hi_lit)),
        len(keep),
        total,
    )


def write_partitioned_fact(
    df: DataFrame, path: str, part_col: str
) -> None:
    """Directory-partition ``df`` by ``part_col`` (the DPP layout)."""
    df.write.mode("overwrite").partitionBy(part_col).parquet(path)


def dpp_join(
    spark: SparkSession,
    fact_path: str,
    dim: DataFrame,
    part_col: str,
) -> DataFrame:
    """Join the directory-partitioned fact to a (small, filtered)
    dimension on the partition column — the shape that lets Spark
    inject a runtime ``dynamicpruning#`` subquery into the fact scan's
    PartitionFilters, so only matching partition directories are read."""
    fact = spark.read.parquet(fact_path)
    return fact.join(F.broadcast(dim), part_col)


def dpp_plan(df: DataFrame) -> str:
    """The compiled physical plan string (for pruning assertions)."""
    return df._jdf.queryExecution().executedPlan().toString()
