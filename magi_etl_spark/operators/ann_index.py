"""Persistent incremental IVF index: the embedding-side twin of the
MinHash index (``operators/lsh_index.py``).

The assigned vectors are stored PARTITIONED BY ``list_id`` — exactly
the layout the IVF docstrings promise: a probe of ``n_probe`` lists is
partition pruning at the file level, so a query touches
``n_probe/n_lists`` of the data at rest.  Centroids live in a JSON
sidecar (n_lists × dim floats — bytes).

Increments assign new vectors to the EXISTING centroids (one narrow
broadcast-argmin scan of the increment; the historical corpus is never
re-read) and append into the same partition layout.  Centroids drift
as a corpus grows — ``load_ivf_index`` + a fresh
``ivf_index_sampled`` rebuild is the periodic re-center; the sidecar
records ``n_appended`` so operators can threshold on drift.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from magi_etl_spark.operators.similarity import assign_to_centroids

_SIDECAR = "_ivf_params.json"


def save_ivf_index(
    assigned: DataFrame, centroids: list[list[float]], path: str
) -> None:
    """Persist an index built by ``ivf_index_sampled`` / ``ivf_index``:
    vectors partitioned by inverted list, centroids in the sidecar."""
    assigned.write.partitionBy("list_id").mode("overwrite").parquet(
        os.path.join(path, "lists")
    )
    with open(os.path.join(path, _SIDECAR), "w") as fh:
        json.dump({"centroids": centroids, "n_appended": 0}, fh)


def load_ivf_index(
    spark: SparkSession, path: str
) -> tuple[DataFrame, list[list[float]]]:
    """(assigned, centroids) ready for ``ivf_topk`` — the scan is
    partition-pruned when the caller (or the probe join) filters on
    ``list_id``."""
    with open(os.path.join(path, _SIDECAR)) as fh:
        meta = json.load(fh)
    assigned = spark.read.parquet(os.path.join(path, "lists"))
    return assigned, meta["centroids"]


def append_to_ivf_index(
    new_vectors: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> int:
    """Assign the increment to the EXISTING centroids and append into
    the partitioned layout; returns the number of appended vectors.
    One narrow scan of the increment — the historical lists are not
    read, let alone rewritten."""
    with open(os.path.join(path, _SIDECAR)) as fh:
        meta = json.load(fh)
    assigned = assign_to_centroids(
        new_vectors, meta["centroids"], id_col=id_col, vec_col=vec_col
    )
    n = assigned.count()
    assigned.write.partitionBy("list_id").mode("append").parquet(
        os.path.join(path, "lists")
    )
    meta["n_appended"] += n
    tmp = os.path.join(path, _SIDECAR + ".tmp")
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    os.replace(tmp, os.path.join(path, _SIDECAR))
    return n


def list_files_probed(path: str, list_ids: list[int]) -> list[str]:
    """The data files a probe of ``list_ids`` touches under the
    partitioned layout (hive-style ``list_id=N`` directories) — the
    file-level pruning evidence.  (``DataFrame.inputFiles()`` reports
    the relation's full listing BEFORE partition filters, so the
    honest check is the directory layout itself plus the plan's
    ``PartitionFilters`` — see ``probe_plan``.)"""
    out: list[str] = []
    for lid in list_ids:
        d = os.path.join(path, "lists", f"list_id={lid}")
        if os.path.isdir(d):
            out += [
                os.path.join(d, f)
                for f in os.listdir(d)
                if f.endswith(".parquet")
            ]
    return sorted(out)


def probe_plan(spark: SparkSession, path: str, list_ids: list[int]) -> str:
    """Physical plan of a probe over ``list_ids`` — callers assert that
    ``PartitionFilters`` carries the list predicate (Catalyst prunes
    the non-probed directories before any file is opened)."""
    df = spark.read.parquet(os.path.join(path, "lists")).where(
        F.col("list_id").isin(list_ids)
    )
    return df._jdf.queryExecution().executedPlan().toString()
