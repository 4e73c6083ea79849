"""Declarative data-quality expectations over DataFrames.

The reference validates frames ad hoc (pandas ``assert``s and manual
``df.head()`` inspection between pipeline stages); warehouse practice
declares expectations and collects VIOLATIONS as data, so a 100 TB
check is one aggregate/join pass that either gates the pipeline or
routes bad rows to a quarantine sink.

Every check returns a DataFrame of violating rows (empty = pass) so
callers compose them lazily; ``check_suite`` runs a list of named
checks and returns one summary row per check in a single action per
check — no driver-side row iteration anywhere.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def expect_not_null(df: DataFrame, cols: list[str]) -> DataFrame:
    """Rows with a NULL in any of ``cols``."""
    cond = None
    for c in cols:
        n = F.col(c).isNull()
        cond = n if cond is None else (cond | n)
    return df.where(cond)


def expect_unique(df: DataFrame, keys: list[str]) -> DataFrame:
    """All rows participating in a duplicated key (not just the extras):
    one map-side-combined count per key, semi-joined back — the violation
    frame carries full rows for quarantine/debugging."""
    dupes = df.groupBy(*keys).count().where(F.col("count") > 1).select(*keys)
    return df.join(dupes, keys, "semi")


def expect_in_range(
    df: DataFrame, col: str, lo=None, hi=None
) -> DataFrame:
    """Rows with ``col`` outside [lo, hi] (either bound optional).
    NULLs are not range violations — pair with expect_not_null."""
    cond = F.lit(False)
    if lo is not None:
        cond = cond | (F.col(col) < F.lit(lo))
    if hi is not None:
        cond = cond | (F.col(col) > F.lit(hi))
    return df.where(cond)


def expect_referential(
    child: DataFrame, parent: DataFrame, on: list[str]
) -> DataFrame:
    """Child rows whose key has no match in ``parent`` (dangling foreign
    keys): one anti join, broadcast when the parent key set is small.
    NULL keys are dangling by definition here (anti join keeps them)."""
    return child.join(parent.select(*on).distinct(), on, "left_anti")


def expect_accepted_values(
    df: DataFrame, col: str, values: list
) -> DataFrame:
    """Rows whose ``col`` is outside the accepted set (NULL included —
    an unexpected NULL is not an accepted value)."""
    return df.where(~F.col(col).isin(values) | F.col(col).isNull())


def expect_condition(df: DataFrame, cond: Column) -> DataFrame:
    """Rows violating an arbitrary boolean Column (the escape hatch);
    NULL evaluations count as violations."""
    return df.where(~F.coalesce(cond, F.lit(False)))


def check_suite(
    checks: dict[str, Callable[[], DataFrame]],
    sample: int = 5,
) -> DataFrame:
    """Run named checks; one summary row each: ``check, violations,
    passed, sample_json`` (up to ``sample`` violating rows as JSON for
    the report/Slack edge — bounded, never a full collect)."""
    frames = []
    for name, build in checks.items():
        v = build()
        rows = v.limit(sample).toJSON().collect()
        n = v.count()
        frames.append(
            v.sparkSession.createDataFrame(
                [(name, n, n == 0, "[" + ",".join(rows) + "]")],
                "check string, violations long, passed boolean, sample_json string",
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out
