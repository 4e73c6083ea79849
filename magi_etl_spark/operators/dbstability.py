"""DBSCAN cluster stability profile — the per-cluster readout over
``dbscan.grid_dbscan``'s labels: core/border composition and the
border ratio, the standard cheap stability diagnostic (Ester et al.
1996 §4 discusses border sensitivity): a cluster held together mostly
by border points sits at the density threshold and dissolves under a
small eps perturbation, while a core-dominated cluster is stable.
The engine's second COMPOSED-operator surface (after grid_dbscan
itself): one keyed aggregation over an already-verified operator's
output, no new join topology.

Exact arithmetic: counts are exact integers; ``border_ratio`` is ONE
double division rounded at the 6-dp grid.

Scale shape: one map-side-combinable aggregation keyed by cluster id
— output bounded by cluster count, corpus touched once (and the
expensive part, the labeling, is grid_dbscan's already-audited
blocked dataflow).

Scope note: the reference app has no clustering surface beyond KMeans
(M6); this completes the q244 density family with its stability
readout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dbscan_cluster_profile(
    labels: DataFrame, round_dp: int = 6
) -> DataFrame:
    """``cluster, n_points, n_core, n_border, border_ratio`` for every
    cluster in a ``grid_dbscan`` label frame (columns ``id, role,
    cluster``).  Noise rows (cluster NULL) are excluded — they belong
    to no cluster; profile them upstream with a plain role count."""
    return (
        labels.where(F.col("cluster").isNotNull())
        .groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.sum(
                F.when(F.col("role") == "core", 1).otherwise(0)
            ).alias("n_core"),
            F.sum(
                F.when(F.col("role") == "border", 1).otherwise(0)
            ).alias("n_border"),
        )
        .select(
            "cluster",
            "n_points",
            "n_core",
            "n_border",
            F.round(
                F.col("n_border").cast("double")
                / F.col("n_points").cast("double"),
                round_dp,
            ).alias("border_ratio"),
        )
    )
