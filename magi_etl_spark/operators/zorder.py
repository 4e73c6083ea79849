"""Z-order (Morton-curve) data layout for multi-column scan pruning.

Parquet scans skip whole files/row groups whose column statistics can't
match the filter; sorting by ONE column makes only that column's stats
tight.  Interleaving the bits of several columns' bucket ranks (a
space-filling curve) makes EVERY participating column's min/max ranges
narrow in every output file, so selective filters on any of them prune
most of the data — the standard lakehouse layout technique for fact
tables queried along several dimensions (the reference's tables are laid
out by whoever loaded the warehouse; here layout is an engine operator).

Everything is JVM-side Column arithmetic: bucket ranks from broadcast
min/max scalars, bit interleaving as shift/or chains inside whole-stage
codegen, then ``repartitionByRange`` + ``sortWithinPartitions`` on the
derived key — one range shuffle, which is the unavoidable cost of any
re-clustering.  At 100 TB the same plan holds: the range partitioner
samples the z-key, and file count scales with the partition count.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(
    df: DataFrame, cols: list[str], bits: int = 10
) -> tuple[DataFrame, Column]:
    """Return ``(df, z)`` where ``z`` is the Morton key interleaving the
    ``bits``-bit bucket ranks of each column in ``cols``.

    Bucket ranks are min/max-scaled: the two scalars per column come from
    ONE aggregate collected on the driver and enter the plan as literals
    (a broadcast of constants, no per-row join).  Total key width is
    ``bits * len(cols)`` and must fit a long."""
    if bits * len(cols) > 63:
        raise ValueError("z-key wider than 63 bits; lower bits or cols")
    from pyspark.sql.types import NumericType

    dtypes = {f.name: f.dataType for f in df.schema.fields}
    for c in cols:
        if c not in dtypes:
            raise ValueError(f"unknown z-order column {c!r}")
        if not isinstance(dtypes[c], NumericType):
            raise ValueError(
                f"z-order column {c!r} has non-numeric type "
                f"{dtypes[c].simpleString()}; cast it first (dates: "
                "datediff from an epoch, strings: a hash or dictionary rank)"
            )
    stats = df.agg(
        *[F.min(c).alias(f"mn_{c}") for c in cols],
        *[F.max(c).alias(f"mx_{c}") for c in cols],
    ).collect()[0]
    n_buckets = 1 << bits
    ranks: list[Column] = []
    for c in cols:
        if stats[f"mn_{c}"] is None or stats[f"mx_{c}"] is None:
            raise ValueError(
                f"cannot z-order on {c!r}: no non-NULL values "
                "(empty input or all-NULL column)"
            )
        mn, mx = float(stats[f"mn_{c}"]), float(stats[f"mx_{c}"])
        span = (mx - mn) or 1.0
        scaled = (F.col(c).cast("double") - F.lit(mn)) / F.lit(span)
        rank = F.greatest(
            F.least(F.floor(scaled * n_buckets).cast("long"), F.lit(n_buckets - 1)),
            F.lit(0),
        )
        # NULL cells sort to bucket 0 EXPLICITLY — least/greatest skip
        # NULLs, which would otherwise quietly park NULL rows in the top
        # bucket next to the maximum values
        ranks.append(F.when(F.col(c).isNull(), F.lit(0)).otherwise(rank))
    # bit i of column j lands at position i * n_cols + j: shift/or chain,
    # fully inside codegen
    terms = [
        F.shiftleft(
            F.shiftrightunsigned(rank, i).bitwiseAND(F.lit(1)),
            i * len(cols) + j,
        )
        for i in range(bits)
        for j, rank in enumerate(ranks)
    ]
    z = reduce(lambda a, b: a.bitwiseOR(b), terms)
    return df, z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 8,
    bits: int = 10,
) -> None:
    """Re-cluster ``df`` along the Morton curve of ``cols`` and write
    ``n_files`` parquet files: range-partition on the z-key (one shuffle,
    sampled ranges → balanced files), sort within each partition so
    row-group stats are tight too, drop the key, write."""
    base, z = zorder_key(df, cols, bits)
    (
        base.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def file_stats_ranges(path: str, cols: list[str]) -> dict[str, list[tuple]]:
    """Per-file (min, max) of each column from parquet footers — the
    statistics the scan pruner consults.  Diagnostic for layout quality:
    after z-ordering, every column's per-file spans should be a small
    fraction of its global span."""
    import os

    import pyarrow.parquet as pq

    out: dict[str, list[tuple]] = {c: [] for c in cols}
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, name)).metadata
        schema_names = [md.schema.column(i).name for i in range(md.num_columns)]
        mins: dict[str, object] = {}
        maxs: dict[str, object] = {}
        for rg in range(md.num_row_groups):
            for i, cname in enumerate(schema_names):
                if cname not in cols:
                    continue
                st = md.row_group(rg).column(i).statistics
                if st is None:
                    continue
                if cname not in mins or st.min < mins[cname]:
                    mins[cname] = st.min
                if cname not in maxs or st.max > maxs[cname]:
                    maxs[cname] = st.max
        for c in cols:
            if c in mins:
                out[c].append((mins[c], maxs[c]))
    return out
