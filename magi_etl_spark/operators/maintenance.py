"""Table maintenance: small-file compaction and schema-drift union.

Streaming sinks and incremental upserts accrete many small parquet
files; at scale the file count itself becomes the bottleneck (driver
file-listing, task-per-file scheduling, NameNode/object-store metadata
pressure).  ``compact_parquet`` rewrites a directory into
size-targeted files using the same crash-safe two-rename swap as the
streaming sink.

Sources drift: a connector adds a column, an upstream type widens.
``evolve_union`` unions frames under the widened common schema instead
of failing, with explicit numeric-widening rules (never silent
narrowing).
"""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# widening lattice: a type may only move rightward
_NUMERIC_ORDER = ["int", "bigint", "float", "double"]


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Rewrite ``path`` (a parquet directory) into ``ceil(total_bytes /
    target_file_bytes)`` files; returns the new file count.  The rewrite
    stages next to the target and swaps with two metadata renames, so a
    crash leaves either the old or the new copy (same recovery contract
    as the streaming upsert sink).  On a real cluster prefer table-format
    compaction (Delta OPTIMIZE / Iceberg rewrite) — this is the plain-
    parquet fallback."""
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
    n = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(path)
    tmp, old = path + ".compacting", path + ".old"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(old, ignore_errors=True)
    # repartition (round-robin) spreads rows evenly across the target
    # file count; coalesce could skew file sizes by collapsing neighbors
    df.repartition(n).write.mode("overwrite").parquet(tmp)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old, ignore_errors=True)
    return n


def _widen(a: str, b: str) -> str:
    if a == b:
        return a
    if a in _NUMERIC_ORDER and b in _NUMERIC_ORDER:
        return _NUMERIC_ORDER[max(_NUMERIC_ORDER.index(a), _NUMERIC_ORDER.index(b))]
    if "date" in (a, b) and "timestamp" in (a, b):
        return "timestamp"
    raise ValueError(f"incompatible types for schema evolution: {a} vs {b}")


def evolve_union(frames: list[DataFrame]) -> DataFrame:
    """Union frames whose schemas drifted: missing columns become NULL,
    numeric types widen (int -> bigint -> float -> double), date widens
    to timestamp; anything else (e.g. string vs int) raises rather than
    guessing."""
    if not frames:
        raise ValueError("evolve_union needs at least one frame")
    types: dict[str, str] = {}
    order: list[str] = []
    for df in frames:
        for name, dtype in df.dtypes:
            if name not in types:
                types[name] = dtype
                order.append(name)
            else:
                types[name] = _widen(types[name], dtype)
    out = None
    for df in frames:
        have = dict(df.dtypes)
        cols = [
            (F.col(c) if have[c] == types[c] else F.col(c).cast(types[c])).alias(c)
            if c in have
            else F.lit(None).cast(types[c]).alias(c)
            for c in order
        ]
        part = df.select(*cols)
        out = part if out is None else out.unionByName(part)
    return out


def incremental_read(
    read,
    wm_col: str,
    state_path: str,
):
    """High-watermark incremental extract: return only rows with
    ``wm_col`` strictly greater than the stored watermark, plus a
    ``commit()`` that advances the stored watermark to this batch's max.

    The watermark is read/written as one tiny JSON file; the filter is a
    plain Column predicate, so at rest it prunes partitions/row groups
    like any other pushdown.  Commit AFTER the downstream write succeeds
    — a crash in between re-extracts the same window, which is safe for
    idempotent sinks (upsert/apply_cdc/dynamic partition overwrite).

    Returns ``(df, commit)``.
    """
    import json
    import os

    from pyspark.sql import functions as F

    prev = None
    if os.path.exists(state_path):
        with open(state_path) as fh:
            prev = json.load(fh).get("watermark")
    df = read()
    if prev is not None:
        df = df.where(F.col(wm_col) > F.lit(prev))

    def commit() -> None:
        hi = df.agg(F.max(F.col(wm_col)).cast("string")).first()[0]
        if hi is None:
            return  # empty batch: watermark unchanged
        os.makedirs(os.path.dirname(state_path) or ".", exist_ok=True)
        tmp = state_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"watermark": hi}, fh)
        os.replace(tmp, state_path)

    return df, commit


def backfill_partitions(
    partitions: list,
    build,
    write,
    state_path: str,
    resume: bool = True,
) -> list:
    """Chunked, crash-resumable backfill: for each key in ``partitions``
    (dates, shards — any JSON-serializable, ORDER of the list is the
    execution order), run ``write(build(key), key)`` and record
    completion in ``state_path`` (atomic replace after each partition).
    A crashed run re-invoked with ``resume=True`` skips completed keys;
    the in-flight key re-runs, so ``write`` must be idempotent — pair
    with the dynamic-partition-overwrite writer, ``upsert``, or
    ``apply_cdc``, which all are.

    Returns the list of keys executed THIS run.  Driver-side loop by
    design: the partition list is the orchestration grain (hundreds of
    dates, not rows), and each iteration is a full distributed job —
    the same economics as the incremental-watermark extractor above.

    Completion tokens are the keys' canonical JSON (sorted keys), so
    every JSON-serializable key — including tuples, which round-trip
    through JSON as lists — matches its stored token on resume (r4
    ADVICE: the raw ``key in done`` comparison silently re-ran every
    completed tuple-keyed partition after a restart).
    """
    import json
    import os

    def tok(k) -> str:
        return json.dumps(k, sort_keys=True, default=str)

    done: list = []
    if resume and os.path.exists(state_path):
        with open(state_path) as fh:
            done = json.load(fh).get("done", [])
    done_toks = {tok(k) for k in done}
    ran = []
    for key in partitions:
        if tok(key) in done_toks:
            continue
        write(build(key), key)
        done.append(key)
        done_toks.add(tok(key))
        ran.append(key)
        os.makedirs(os.path.dirname(state_path) or ".", exist_ok=True)
        tmp = state_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"done": done}, fh)
        os.replace(tmp, state_path)
    return ran
