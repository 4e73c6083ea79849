"""Temporal joins Spark lacks as built-ins: as-of join and binned range
join (brief-listed custom operators; the reference delegates time logic
to SQL templates).

**As-of join** (each left row ⟵ the latest right row with the same key
and ``right.ts <= left.ts``): the naive formulation is a range join that
Spark executes as a broadcast-nested-loop or an exploded
inequality-join — quadratic per key.  The scalable form used here is
the union-and-carry trick: union both sides into one stream, sort each
key's partition once by (ts, side), and carry the last-seen right
values forward with ``last(..., ignorenulls=True)`` over a running
window.  Cost: ONE shuffle on the key (the same as any grouped
aggregate), no pair explosion, no driver loops — the canonical
pattern behind kdb's aj and Flink's temporal join at Spark scale.

**Range join** (left.ts ∈ [right.start, right.end)): Spark turns a raw
interval predicate into BNL.  The scalable form bins time into
fixed-width buckets, replicates each right interval into the buckets it
overlaps, and equi-joins on (key, bucket) before re-applying the exact
predicate — the replication factor is interval_length/bin_width,
chosen small, and the join becomes a plain hash join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str = "ts",
    right_cols: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """For every left row, attach the most recent right row of the same
    ``key`` with ``right.ts <= left.ts`` (inclusive; at equal timestamps
    the right row wins, matching DuckDB/kdb asof semantics).  Right
    payload columns arrive prefixed ``asof_`` plus ``asof_ts``;
    ``how="inner"`` drops unmatched left rows, ``"left"`` keeps them
    with NULLs."""
    right_cols = right_cols or [
        c for c in right.columns if c not in (key, ts)
    ]
    l = left.withColumn("_is_left", F.lit(1))
    r = right.select(
        F.col(key),
        F.col(ts),
        F.col(ts).alias("_r_ts"),
        *[F.col(c).alias(f"asof_{c}") for c in right_cols],
    ).withColumn("_is_left", F.lit(0))
    u = l.unionByName(r, allowMissingColumns=True)
    # right rows order BEFORE left rows at the same ts => inclusive match
    w = (
        W.partitionBy(key)
        .orderBy(F.col(ts), F.col("_is_left"))
        .rowsBetween(W.unboundedPreceding, 0)
    )
    carried = ["_r_ts"] + [f"asof_{c}" for c in right_cols]
    out = u
    for c in carried:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    out = out.where(F.col("_is_left") == 1).drop("_is_left")
    out = out.withColumnRenamed("_r_ts", "asof_ts")
    if how == "inner":
        out = out.where(F.col("asof_ts").isNotNull())
    elif how != "left":
        raise ValueError(f"asof_join supports inner/left, got {how!r}")
    return out


def range_join(
    left: DataFrame,
    intervals: DataFrame,
    key: str,
    ts: str = "ts",
    start: str = "start",
    end: str = "end",
    bin_seconds: int = 3600,
) -> DataFrame:
    """Equi-join ``left`` rows to interval rows with the same ``key``
    and ``start <= ts < end``, via time binning: intervals replicate
    into each ``bin_seconds`` bucket they overlap (explode of a bounded
    sequence), points land in exactly one bucket, and the exact
    predicate re-filters after a plain hash join on (key, bucket).
    Pick ``bin_seconds`` near the typical interval length: replication
    is ceil(len/bin)+1 rows per interval.

    ``ts``/``start``/``end`` may be timestamps or integer epoch
    MICROseconds (longs) — integer time columns sidestep cross-engine
    timestamp-precision truncation when an external oracle re-runs the
    join."""
    types = dict(left.dtypes + intervals.dtypes)

    def _us(c):
        return F.col(c) if types.get(c) == "bigint" else F.unix_micros(F.col(c))

    bin_us = bin_seconds * 1_000_000
    bin_l = F.floor(_us(ts) / bin_us).cast("long")
    b0 = F.floor(_us(start) / bin_us).cast("long")
    b1 = F.floor(_us(end) / bin_us).cast("long")
    pts = left.withColumn("_bin", bin_l)
    ivs = intervals.withColumn("_bin", F.explode(F.sequence(b0, b1)))
    joined = pts.join(ivs, [key, "_bin"]).where(
        (F.col(ts) >= F.col(start)) & (F.col(ts) < F.col(end))
    )
    return joined.drop("_bin")
