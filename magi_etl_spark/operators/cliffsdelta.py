"""Cliff's delta (Cliff 1993) — the ordinal EFFECT SIZE beside the
Mann–Whitney test: "by how much does one group dominate the other",
on the scale every meta-analysis uses:

    delta = ( #{x_1 > x_0} - #{x_1 < x_0} ) / (n_1 * n_0)   in [-1, 1]

(+1 = complete dominance of group 1, 0 = stochastic equality).  Equal
to the rank-biserial correlation, and to 2*AUC - 1 — which is exactly
how it is computed here: a COMPOSED operator over ``auc.group_auc``
(the engine's third composed-machinery gate, after q255-over-q244 and
q251-over-_rank2), riding its exact integer ``u2 = 2U`` evidence
column, never its rounded ``auc`` output:

    u2 = 2 * #{x_1 > x_0} + #{ties}
    #{>} - #{<} = u2 - n_1 * n_0        (since #{>}+#{<}+#{=} = n_1 n_0)
    delta = (u2 - n_1 n_0) / (n_1 n_0)

The dominance numerator ``d_num = u2 - n_pos * n_neg`` is an exact
(possibly negative) integer in decimal(38,0); ONE double division at
the end, rounded at the 6-dp grid.

Scale shape: exactly ``group_auc``'s — one count aggregation over
(group, distinct score), a keyed cumulative window over distinct
scores, one keyed aggregation; this module adds a single select.

Scope note: the reference app has no effect-size surface — this gives
q238's AUC family its standardized-magnitude readout (the p-value says
"real", delta says "big enough to matter").
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(38,0)"


def cliffs_delta(
    df: DataFrame,
    group_cols: list[str],
    score: Column,
    label: Column,
    round_dp: int = 6,
) -> DataFrame:
    """``*group_cols, n_pos, n_neg, d_num, delta`` — Cliff's delta of
    integer ``score`` between the ``label == 1`` sample (positive /
    group 1) and the rest, per group.  ``d_num`` is the exact integer
    dominance count ``#{pos > neg} - #{pos < neg}``; ``delta =
    d_num / (n_pos * n_neg)``.  Null scores are dropped and groups
    missing either class drop out — both inherited from ``group_auc``
    (a one-class group has no between-group pairs)."""
    from magi_etl_spark.operators.auc import group_auc

    reserved = {"n_pos", "n_neg", "d_num", "delta", "u2", "auc"} & set(
        group_cols
    )
    if reserved:
        raise ValueError(
            f"group_cols collide with working columns: {sorted(reserved)}"
        )
    base = group_auc(df, group_cols, score, label)
    nn = F.col("n_pos").cast(_DEC) * F.col("n_neg").cast(_DEC)
    d_num = F.col("u2").cast(_DEC) - nn
    return base.select(
        *group_cols,
        "n_pos",
        "n_neg",
        d_num.cast("long").alias("d_num"),
        F.round(d_num.cast("double") / nn.cast("double"), round_dp).alias(
            "delta"
        ),
    )
