"""Temporal (out-of-time) dataset splitting.

The hash-based split (``operators/mixing.py``) samples UNIFORMLY — the
right default for i.i.d. corpora, and exactly wrong for forecasting /
recommendation / any time-leaky evaluation, where the model must be
scored on data STRICTLY AFTER everything it trained on.  The
out-of-time split holds out each group's most recent fraction: leakage
is impossible by construction, per group.

Scale shape: one keyed shuffle (group columns), two frames over the
same sort — a row_number and a group count — then an integer-exact
threshold.  No collect, no global sort; the percentage test is pure
integer arithmetic (``rn * 100 <= n * pct``) so no float boundary can
disagree between engines or flip under replay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def out_of_time_split(
    df: DataFrame,
    group_cols: list[str],
    ts_col: str,
    tie_col: str,
    train_pct: int = 80,
    split_col: str = "split",
) -> DataFrame:
    """Add ``split_col`` ∈ {train, test}: within each group (ordered by
    ``ts_col``, ties broken by the unique ``tie_col``), the earliest
    ``train_pct`` percent of rows are ``train`` and the remainder
    ``test``.  A row is train iff ``rn * 100 <= n_rows * train_pct`` —
    integer-exact, so the boundary row lands identically everywhere.
    Groups smaller than ``100 / (100 - train_pct)`` rows may have no
    test rows (a 1-row group is all train at 80 pct); callers that need
    a guaranteed holdout should filter such groups first."""
    if not 0 <= train_pct <= 100:
        raise ValueError(f"train_pct must be in [0, 100], got {train_pct}")
    w = W.partitionBy(*group_cols).orderBy(F.asc(ts_col), F.asc(tie_col))
    wn = W.partitionBy(*group_cols)
    rn = F.row_number().over(w)
    n = F.count(F.lit(1)).over(wn)
    return df.withColumn(
        split_col,
        F.when(rn * 100 <= n * train_pct, F.lit("train")).otherwise(
            F.lit("test")
        ),
    )
