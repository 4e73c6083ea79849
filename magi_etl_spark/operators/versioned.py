"""Manifest-based versioned parquet tables: atomic commits, time-travel
reads, and O(1) current-version resolution — a deliberately minimal
subset of the Delta/Iceberg contract for plain-parquet environments.

Why manifests matter at 100 TB: a directory-listing read is an
object-store metadata scan that grows with file count and races
concurrent writers; a manifest read is ONE small JSON file naming the
exact data files of a version.  Readers never see a partial commit
(the manifest is written to a temp name and atomically renamed), old
versions stay readable until vacuumed, and a crashed writer leaves at
most an orphaned data directory that the next ``vacuum`` removes —
never a corrupt table.

Layout::

    table/
      _versions/v000001.json   # {"version", "files", "n_files", "schema"}
      _latest                  # text file: highest committed version
      data/v000001/...parquet

On a real cluster prefer Delta/Iceberg — this is the dependency-free
fallback with the same read semantics (reference S13's cache-with-TTL
is the closest analogue: ``cache.py`` stores one result; this stores
every version).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def _vdir(path: str) -> str:
    return os.path.join(path, "_versions")


def _latest_path(path: str) -> str:
    return os.path.join(path, "_latest")


def current_version(path: str) -> int | None:
    """Highest committed version, or None for an empty/new table."""
    p = _latest_path(path)
    if not os.path.exists(p):
        return None
    with open(p) as fh:
        return int(fh.read().strip())


def _data_files(data_dir: str) -> list[str]:
    return sorted(
        os.path.join(data_dir, f)
        for f in os.listdir(data_dir)
        if f.endswith(".parquet")
    )


def _publish(
    path: str,
    v: int,
    files: list[str],
    schema_json: str,
    txn_id: str | None = None,
    op: str = "write",
) -> int:
    """One manifest write + one atomic rename: readers can never
    observe a half-written version."""
    os.makedirs(_vdir(path), exist_ok=True)
    manifest = {
        "version": v,
        "files": files,
        "n_files": len(files),
        "schema": schema_json,
        "txn_id": txn_id,
        "op": op,
    }
    mpath = os.path.join(_vdir(path), f"v{v:06d}.json")
    with open(mpath + ".tmp", "w") as fh:
        json.dump(manifest, fh)
    os.replace(mpath + ".tmp", mpath)
    with open(_latest_path(path) + ".tmp", "w") as fh:
        fh.write(str(v))
    os.replace(_latest_path(path) + ".tmp", _latest_path(path))
    return v


def write_version(df: DataFrame, path: str) -> int:
    """Commit ``df`` as the next version of the table at ``path`` and
    return its number.  The data lands in a version-private directory,
    then the manifest publish makes it visible — a writer crash before
    the rename leaves the previous version current."""
    v = (current_version(path) or 0) + 1
    data_dir = os.path.join(path, "data", f"v{v:06d}")
    df.write.mode("overwrite").parquet(data_dir)
    return _publish(path, v, _data_files(data_dir), df.schema.json())


def append_version(
    df: DataFrame, path: str, txn_id: str | None = None
) -> int:
    """Commit ``df`` as an APPEND: the new version's manifest lists the
    previous version's files plus the new batch's — no rewrite of
    existing data, so an append costs only the new rows (the Delta
    append shape on plain parquet).

    ``txn_id`` makes replays idempotent: if ANY live manifest already
    carries this transaction id, the append is a no-op returning the
    current version — which turns a checkpoint-replayed streaming
    micro-batch (same batch id, same data) into exactly-once table
    semantics even though the batch itself ran twice.  The check scans
    all live manifests (r4 ADVICE: latest-only broke exactly-once when
    a maintenance commit, e.g. ``optimize_versioned``, interleaved
    between a crash and the checkpoint replay); ``vacuum`` keeps at
    least one manifest, so the id history window equals the retention
    window — the same recovery contract as Delta's txn appId/version.
    Single-writer assumption: two concurrent appenders can both pass
    the replay check and double-commit; serialize writers externally
    (the streaming sink's foreachBatch already is serial)."""
    prev = current_version(path)
    prev_files: list[str] = []
    if prev is not None:
        if txn_id is not None:
            for v in list_versions(path):
                with open(os.path.join(_vdir(path), f"v{v:06d}.json")) as fh:
                    if json.load(fh).get("txn_id") == txn_id:
                        return prev  # replayed transaction: already committed
        with open(os.path.join(_vdir(path), f"v{prev:06d}.json")) as fh:
            prev_files = json.load(fh)["files"]
    v = (prev or 0) + 1
    data_dir = os.path.join(path, "data", f"v{v:06d}")
    df.write.mode("overwrite").parquet(data_dir)
    return _publish(
        path,
        v,
        prev_files + _data_files(data_dir),
        df.schema.json(),
        txn_id=txn_id,
        op="append",
    )


def optimize_versioned(
    spark: SparkSession,
    path: str,
    zorder_cols: list[str],
    n_files: int = 8,
) -> int:
    """Delta ``OPTIMIZE ... ZORDER BY`` analogue: rewrite the CURRENT
    version re-clustered along the Morton curve of ``zorder_cols``
    (``operators/zorder.py`` — one range shuffle, sorted row groups)
    and commit the result as a new version.  Readers of older versions
    are untouched; ``vacuum`` reclaims the un-clustered files once
    retention passes.  Contents are identical by construction — only
    the file layout (and therefore stats-based pruning) changes."""
    from magi_etl_spark.operators.zorder import write_zordered

    df = read_version(spark, path)
    v = (current_version(path) or 0) + 1
    data_dir = os.path.join(path, "data", f"v{v:06d}")
    write_zordered(df, data_dir, zorder_cols, n_files=n_files)
    return _publish(
        path, v, _data_files(data_dir), df.schema.json(), op="optimize"
    )


def history(path: str) -> list[dict]:
    """Commit log, oldest first: one dict per live version with
    ``version, op, txn_id, n_files`` — the table's audit surface."""
    out = []
    for v in list_versions(path):
        with open(os.path.join(_vdir(path), f"v{v:06d}.json")) as fh:
            m = json.load(fh)
        out.append(
            {
                "version": m["version"],
                "op": m.get("op", "write"),
                "txn_id": m.get("txn_id"),
                "n_files": m["n_files"],
            }
        )
    return out


def read_version(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Read a specific version (default: current) from its manifest —
    the exact file list, no directory listing, no eventual-consistency
    window."""
    v = version if version is not None else current_version(path)
    if v is None:
        raise FileNotFoundError(f"no committed version at {path}")
    mpath = os.path.join(_vdir(path), f"v{v:06d}.json")
    if not os.path.exists(mpath):
        raise FileNotFoundError(f"version {v} does not exist at {path}")
    with open(mpath) as fh:
        manifest = json.load(fh)
    return spark.read.parquet(*manifest["files"])


def list_versions(path: str) -> list[int]:
    if not os.path.isdir(_vdir(path)):
        return []
    return sorted(
        int(f[1:-5]) for f in os.listdir(_vdir(path)) if f.endswith(".json")
    )


def vacuum(
    path: str, keep_last: int = 2, min_age_seconds: float = 3600.0
) -> list[int]:
    """Drop manifests + data of all but the last ``keep_last`` versions
    (and any orphaned data directories from crashed writers).  Returns
    the removed version numbers.  Readers of a vacuumed version fail
    loudly at manifest resolution — the same contract as Delta VACUUM
    past the retention window.

    Unreferenced data directories younger than ``min_age_seconds`` are
    SKIPPED (r4 ADVICE): a concurrent writer materializes its data
    directory BEFORE publishing the manifest, so an age-less vacuum
    racing a write would destroy the in-flight commit.  The default
    hour mirrors Delta VACUUM's retention-check spirit; pass ``0`` only
    when no writer can be active (e.g. tests)."""
    import time

    if keep_last < 1:
        raise ValueError(f"keep_last must be >= 1, got {keep_last}")
    versions = list_versions(path)
    drop = versions[:-keep_last] if keep_last < len(versions) else []
    for v in drop:
        os.remove(os.path.join(_vdir(path), f"v{v:06d}.json"))
    # appends share data directories across versions, so deletion is by
    # REFERENCE, not by version number: a data directory survives while
    # any live manifest lists a file inside it (orphans from crashed
    # pre-manifest writers have no references and go too — once they
    # age past the in-flight window)
    referenced: set[str] = set()
    for v in list_versions(path):
        with open(os.path.join(_vdir(path), f"v{v:06d}.json")) as fh:
            for f in json.load(fh)["files"]:
                referenced.add(os.path.basename(os.path.dirname(f)))
    data_root = os.path.join(path, "data")
    now = time.time()
    if os.path.isdir(data_root):
        for d in os.listdir(data_root):
            full = os.path.join(data_root, d)
            if d in referenced:
                continue
            try:
                age = now - os.path.getmtime(full)
            except OSError:
                continue  # concurrently removed/being written
            if age < min_age_seconds:
                continue  # possibly an in-flight writer's directory
            shutil.rmtree(full, ignore_errors=True)
    return drop
