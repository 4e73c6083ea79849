"""Incremental rollup refresh: fold a new data increment into an
existing aggregate table without recomputing history.

The batch pipelines materialize daily rollups (counts, sums, distinct
proxies); at 100 TB a full daily recompute rescans the whole fact
table, while the increment is one day's partition.  The refresh
contract is the standard mergeable-aggregate decomposition:

* ``SUM``/``COUNT``         -> sum of partials (exactly mergeable)
* ``MIN``/``MAX``           -> min/max of partials (exactly mergeable)
* ``COUNT(DISTINCT)``       -> NOT mergeable from partial counts — keep
  the distinct KEYS (or an HLL sketch) as state instead; merging two
  distinct-counts overcounts the overlap.  ``incremental_rollup``
  therefore refuses distinct specs by construction; use
  ``approx_count_distinct`` sketches or a key-level rollup upstream.

``refresh`` is prior ⟗ delta on the group keys with per-metric merge
expressions — a full-outer broadcast-able join when the delta's group
set is small (one day touches few groups), never a rescan of history.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MERGES = {
    "sum": F.sum,
    "count": F.sum,  # partial counts merge by summing
    "min": F.min,
    "max": F.max,
    # distinct via a mergeable HLL state: sketch-of-union == union-of-
    # sketches, so folding increments gives EXACTLY the estimate a full
    # recompute would (same sketch, same estimate — not merely close)
    "approx_distinct": None,  # handled specially (binary sketch column)
}


@dataclass(frozen=True)
class MetricCol:
    name: str
    kind: str  # sum | count | min | max | approx_distinct

    def __post_init__(self):
        if self.kind not in _MERGES:
            raise ValueError(
                f"{self.kind!r} is not a mergeable aggregate; "
                "exact COUNT(DISTINCT) needs key-level state — use "
                "'approx_distinct' for the mergeable HLL-sketch form"
            )


def aggregate_increment(
    delta: DataFrame, group_cols: list[str], metrics: list[MetricCol], exprs: dict
) -> DataFrame:
    """Aggregate one increment into rollup shape: ``exprs`` maps metric
    name -> input Column (e.g. ``{"n": F.lit(1), "v": F.col("value")}``;
    count metrics aggregate ``F.count`` over their expr)."""
    aggs = []
    for m in metrics:
        src = exprs[m.name]
        if m.kind == "count":
            agg = F.count(src)
        elif m.kind == "approx_distinct":
            agg = F.hll_sketch_agg(src)  # binary sketch state, mergeable
        else:
            agg = getattr(F, m.kind)(src)
        aggs.append(agg.alias(m.name))
    return delta.groupBy(*group_cols).agg(*aggs)


def refresh(
    prior: DataFrame | None,
    increment: DataFrame,
    group_cols: list[str],
    metrics: list[MetricCol],
) -> DataFrame:
    """Merge an aggregated increment into the prior rollup.  Groups only
    in one side pass through; shared groups merge per metric kind."""
    if prior is None:
        return increment
    inc = increment
    merged = prior.alias("p").join(
        inc.alias("i"), on=group_cols, how="full_outer"
    )
    out_cols = [F.col(c) for c in group_cols]
    for m in metrics:
        p, i = F.col(f"p.{m.name}"), F.col(f"i.{m.name}")
        if m.kind in ("sum", "count"):
            merge = F.coalesce(p, F.lit(0)) + F.coalesce(i, F.lit(0))
        elif m.kind == "min":
            merge = F.least(p, i)  # least/greatest skip NULLs in Spark
        elif m.kind == "approx_distinct":
            merge = F.when(p.isNull(), i).when(i.isNull(), p).otherwise(
                F.hll_union(p, i)
            )
        else:
            merge = F.greatest(p, i)
        out_cols.append(merge.alias(m.name))
    return merged.select(*out_cols)


def estimate_distinct(rollup: DataFrame, sketch_cols: list[str]) -> DataFrame:
    """Replace HLL sketch-state columns with their cardinality estimates
    (read-side finalization; keep the sketches in storage so future
    increments stay mergeable)."""
    out = rollup
    for c in sketch_cols:
        out = out.withColumn(c, F.hll_sketch_estimate(F.col(c)))
    return out
