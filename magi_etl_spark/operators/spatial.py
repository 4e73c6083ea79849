"""Grid-blocked epsilon-distance join in planar integer coordinates —
the spatial-blocking pattern (fixed-grid cells + neighbor-cell
candidate generation) that turns an all-pairs proximity query into a
density-bounded join, the 2D analogue of the LSH band buckets the dedup
family uses.

Each point lands in one ``eps``-sized grid cell; any pair within
``eps`` lies in the same or an adjacent cell, so candidates come from a
9-cell neighborhood join keyed on cell id and the exact integer
predicate ``dx^2 + dy^2 <= eps^2`` is re-applied on candidates only.
At 100 TB the candidate stream is bounded by local density (points per
cell), never by corpus size; there is no all-pairs path.

Determinism: coordinates are integers (micro-units), cell ids are exact
floor divisions (``x DIV eps`` minus one when the remainder is negative
— `DIV` truncates toward zero, and the remainder-sign adjustment makes
it a true floor for negative coordinates without ever leaving BIGINT),
and distances are exact decimal(38,0) squares — no trigonometry, no
float boundary.  A geodesic (haversine) variant
slots into the same skeleton, but libm trig is not bit-reproducible
across engines, so the gate-checked operator keeps the exact planar
metric; callers approximate geodesics by pre-scaling longitude.

Scope note: the reference app has no spatial surface — this extends
the blocking-join toolbox (LSH bands, sorted-neighborhood q97, prefix
filter q195) to metric coordinates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(38,0)"
# cell-id type for the neighborhood join keys: int64 cell ids fit in 19
# digits, and the ±1 probe offset needs one more value of headroom
_CELL_DEC = "decimal(20,0)"

# Exact floor(coord / eps) on BIGINTs of any sign: truncating `DIV`
# equals floor when the remainder is non-negative and is one cell high
# when it is negative, so subtracting the remainder-sign flag gives the
# exact floor.  Every intermediate (`DIV`, `%`, the 0/1 flag) stays in
# BIGINT range for EVERY int64 input including LONG_MIN — the earlier
# `(_x_ - pmod(_x_, _e_)) DIV _e_` form subtracts a non-negative pmod
# from the raw coordinate and leaves int64 near LONG_MIN (raises under
# ANSI Spark, wraps to the wrong cell otherwise; the selection.py
# span lesson).  Named columns only (the epochs idiom, no value
# splicing), and no double `/` that would lose precision past 2**53.
_CELL_X = "_x_ DIV _e_ - (CASE WHEN _x_ % _e_ < 0 THEN 1 ELSE 0 END)"


def _with_cells(
    df: DataFrame, x: str, y: str, eps: Column, cx: str, cy: str
) -> DataFrame:
    out = df.withColumn("_e_", eps)
    for src, dst in ((x, cx), (y, cy)):
        out = out.withColumn("_x_", F.col(src)).withColumn(
            dst, F.expr(_CELL_X)
        )
    return out.drop("_x_", "_e_")


def grid_blocked_eps_join(
    left: DataFrame,
    right: DataFrame,
    eps: int,
    left_cols: list[str],
    right_cols: list[str],
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """All pairs (one ``left`` row, one ``right`` row) with
    ``(l.x - r.x)^2 + (l.y - r.y)^2 <= eps^2``, as
    ``*left_cols, *right_cols, dist2`` (``dist2`` BIGINT).  Both inputs
    carry integer ``x_col``/``y_col``; ``left_cols``/``right_cols`` are
    the identity columns to emit (disjoint names).  Self-join dedup
    (``id_l < id_r``) is the caller's filter on the emitted ids."""
    if int(eps) <= 0:
        raise ValueError(f"eps must be a positive integer, got {eps!r}")
    e = F.lit(int(eps))
    l = _with_cells(
        left.select(
            *left_cols,
            F.col(x_col).cast("long").alias("_lx"),
            F.col(y_col).cast("long").alias("_ly"),
        ),
        "_lx",
        "_ly",
        e,
        "_cx",
        "_cy",
    )
    # explode LEFT into its 9-cell neighborhood; the right side keeps one
    # row per point, so the join is keyed and the blow-up is exactly 9x
    # on the probe side.  Each left point probes 9 DISTINCT cells and a
    # right point has ONE home cell, so every (left, right) pair can
    # match at most once — no post-join dedup needed.  The ±1 probe
    # offsets ride decimal(20,0): at eps=1 the cell id EQUALS the
    # coordinate, so ``_cx + 1`` at LONG_MAX (or ``- 1`` at LONG_MIN)
    # leaves int64 — |cell| <= 2**63 plus one fits in 20 digits, so the
    # decimal join key is exact for every int64 input at every eps.
    l9 = (
        l.select("*", F.expr("explode(array(-1, 0, 1))").alias("_dx"))
        .select("*", F.expr("explode(array(-1, 0, 1))").alias("_dy"))
        .select(
            *left_cols,
            "_lx",
            "_ly",
            (F.col("_cx").cast(_CELL_DEC) + F.col("_dx"))
            .cast(_CELL_DEC)
            .alias("_jx"),
            (F.col("_cy").cast(_CELL_DEC) + F.col("_dy"))
            .cast(_CELL_DEC)
            .alias("_jy"),
        )
    )
    r = _with_cells(
        right.select(
            *right_cols,
            F.col(x_col).cast("long").alias("_rx"),
            F.col(y_col).cast("long").alias("_ry"),
        ),
        "_rx",
        "_ry",
        e,
        "_jx",
        "_jy",
    ).withColumns(
        {
            "_jx": F.col("_jx").cast(_CELL_DEC),
            "_jy": F.col("_jy").cast(_CELL_DEC),
        }
    )
    dx = F.col("_lx").cast(_DEC) - F.col("_rx").cast(_DEC)
    dy = F.col("_ly").cast(_DEC) - F.col("_ry").cast(_DEC)
    dist2 = dx * dx + dy * dy
    return (
        l9.join(r, ["_jx", "_jy"])
        .select(
            *left_cols,
            *right_cols,
            dist2.alias("_d2"),
        )
        .where(F.col("_d2") <= F.lit(int(eps) * int(eps)).cast(_DEC))
        .select(*left_cols, *right_cols, F.col("_d2").cast("long").alias("dist2"))
    )


def nearest_in_radius(
    left: DataFrame,
    right: DataFrame,
    eps: int,
    left_cols: list[str],
    right_cols: list[str],
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Per ``left`` identity: the single nearest ``right`` point within
    ``eps`` (ties broken by the right identity columns ascending), as
    ``*left_cols, *right_cols, dist2``.  Lefts with no neighbor in
    range drop out."""
    pairs = grid_blocked_eps_join(
        left, right, eps, left_cols, right_cols, x_col, y_col
    )
    pick = F.min(
        F.struct("dist2", *right_cols)
    ).alias("_best")
    return (
        pairs.groupBy(*left_cols)
        .agg(pick)
        .select(
            *left_cols,
            *[F.col(f"_best.{c}").alias(c) for c in right_cols],
            F.col("_best.dist2").alias("dist2"),
        )
    )
