"""Storage-agnostic MERGE INTO: the three-clause Delta/Iceberg merge
(WHEN MATCHED UPDATE / WHEN MATCHED DELETE / WHEN NOT MATCHED INSERT)
as one full-outer DataFrame join.

``operators/upsert.py`` covers the two common special cases (blind
upsert; CDC log compaction).  The general merge adds conditional
deletes and partial-column updates in the same pass — the shape
warehouse maintenance jobs (GDPR erasure + correction + late-arrival
insert in one statement) actually run.  One hash join on the key, no
collects; pair with ``operators/versioned.py`` to commit the result as
a new table version.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_into(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    update_cols: list[str] | None = None,
    delete_col: str | None = None,
    insert: bool = True,
) -> DataFrame:
    """The merged state of ``target`` after applying ``source``:

    - matched rows (key in both) with ``source.delete_col`` true are
      DELETED;
    - other matched rows take ``update_cols`` (default: every non-key
      shared column) from the source and keep their remaining target
      columns;
    - unmatched source rows are INSERTED (unless ``insert=False`` or
      flagged for delete — a delete of an absent key is a no-op, the
      idempotent reading);
    - unmatched target rows pass through.

    ``source`` must have at most one row per key (the Delta MERGE
    multiple-match error is the caller's job to avoid — pre-compact
    with ``upsert.latest_changes``).  Output schema = target schema.
    One full-outer hash join on the key; every branch is a projection
    of that join, so the plan stays single-shuffle-per-side."""
    t_cols = target.columns
    shared = [
        c for c in t_cols if c in source.columns and c not in keys
    ]
    upd = shared if update_cols is None else update_cols
    missing = [c for c in upd if c not in source.columns]
    if missing:
        raise ValueError(f"update_cols absent from source: {missing}")
    # Presence comes from pre-join marker columns, NOT key-null tests: a
    # target row whose key is NULL never matches in the join (SQL NULL
    # semantics, same as Delta), but it must still PASS THROUGH as an
    # unmatched target row — a key-null presence test silently dropped
    # it (r5 ADVICE item 1; same null-key class as stats._join_bounds).
    t = target.withColumn("_t_present", F.lit(True)).alias("t")
    s = source.withColumn("_s_present", F.lit(True)).alias("s")
    cond = None
    for k in keys:
        eq = F.col(f"t.{k}") == F.col(f"s.{k}")
        cond = eq if cond is None else cond & eq
    j = t.join(s, cond, "full_outer")
    t_present = F.col("t._t_present").isNotNull()
    s_present = F.col("s._s_present").isNotNull()
    deleting = (
        F.col(f"s.{delete_col}") if delete_col is not None else F.lit(False)
    )
    # matched deletes drop; unmatched source deletes are no-ops; inserts
    # only when enabled
    keep = (
        (t_present & ~s_present)
        | (t_present & s_present & ~deleting)
        | (~t_present & s_present & F.lit(insert) & ~deleting)
    )
    out_cols = []
    for c in t_cols:
        if c in keys:
            out_cols.append(F.coalesce(F.col(f"t.{c}"), F.col(f"s.{c}")).alias(c))
        elif c in shared:
            # INSERTED rows take every shared column from the source
            # (the Delta INSERT-all clause); MATCHED rows take only the
            # update set; untouched target rows keep their own values
            take_source = (~t_present) | (s_present & F.lit(c in upd))
            out_cols.append(
                F.when(take_source, F.col(f"s.{c}"))
                .otherwise(F.col(f"t.{c}"))
                .alias(c)
            )
        else:
            out_cols.append(F.col(f"t.{c}").alias(c))
    return j.where(keep).select(*out_cols)
