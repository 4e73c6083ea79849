"""Simple quantile regression y = a + b*x at a fixed quantile tau
(Koenker & Bassett 1978), fitted by FIXED-ROUND coordinate descent on
the check loss — each coordinate update is an exact WEIGHTED-QUANTILE
selection, the classic iterated-weighted-median scheme:

- intercept step (b fixed): a = tau-quantile of the residuals
  r_i = y_i - b x_i  (the check-loss minimizer in a alone);
- slope step (a fixed): the loss in b alone is
  sum_i |x_i| * rho_{tau_i}(s_i - b) with candidate slopes
  s_i = (y_i - a)/x_i over x_i != 0 and tau_i = tau for x_i > 0 but
  1 - tau for x_i < 0 (the check function's asymmetry flips with the
  sign of x).  Its subgradient crosses zero at the smallest candidate
  s where the |x|-weighted cumulative mass reaches
  T = tau * P + (1 - tau) * M  (P / M = total |x| over positive /
  negative x) — a weighted quantile, selected exactly.

x is CENTERED at its per-key integer median first (itself an exact
weighted-quantile selection): centering shrinks the coordinate
coupling, so descent that needs ~12+ alternations from raw x snaps in
3–4 rounds on coarse/random data; on smooth polyhedral valleys the
rate is linear (~halving per round — measured on a y = 10x + U{0..4}
grid: slope error 6% after 4 rounds, 0.07% after the default 8).  The
reported intercept is de-centered exactly (a = a' - b*median, all
integers).  The ROUND COUNT is the deterministic contract (the IPF /
q250 posture): the estimate after R rounds is the operator's
definition, and the oracle unrolls the identical selections.

Engine parity, all selections exact: values ride the integer micro
grid (a6 = 1e6*a), residual candidates r6 = 1e6*y - b6*x are exact
decimal(38,0), slope candidates s6 = round((1e6*y - a6)/x) are ONE
double division of exact integers rounded back to the grid, tau is a
RATIONAL tau_num/tau_den so every threshold comparison is an exact
integer inequality (tau_den * cumw >= tau_num * P + (tau_den -
tau_num) * M) — no float ever orders or thresholds anything.

Scale shape: the corpus collapses ONCE into a (key, x, y, count) cell
frame that is eagerly localCheckpointed (never persist() — the dbscan
cache-manager lesson); every half-step re-reads the checkpoint, and
the one-row-per-key parameter frame is re-checkpointed after each
selection so the lazy plan never doubles (the q250 IPF lesson: 3
rounds once compiled to 446 exchanges).  Selections are keyed windows
over DISTINCT candidate values — never a single-partition funnel.

Scope note: the reference app has no regression surface beyond OLS
(q152) and Theil–Sen (q205) — this adds the conditional-QUANTILE line
(tail behavior: "how does p90 latency scale with load"), which neither
mean-based OLS nor median-slope Theil–Sen answers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from magi_etl_spark.chkpt import materialize

_DEC = "decimal(38,0)"
_MICRO = 1_000_000


def _weighted_quantile(
    cand: DataFrame,
    key_cols: list[str],
    val: str,
    weight: str,
    thresh: str,
    out: str,
) -> DataFrame:
    """Per key: the smallest ``val`` whose cumulative ``weight`` (over
    distinct values ascending) reaches ``thresh`` — all exact decimals;
    callers bake the tau denominator into the weight and the numerator
    into the threshold, so the comparison is a pure integer
    inequality.  ``cand`` must carry one row per (key, val) with the
    per-key ``thresh`` attached."""
    w = (
        W.partitionBy(*key_cols)
        .orderBy(F.asc(val))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        cand.select(
            *key_cols,
            F.col(val),
            F.col(thresh),
            F.sum(weight).over(w).alias("_cum"),
        )
        .where(F.col("_cum") >= F.col(thresh))
        .groupBy(*key_cols)
        .agg(F.min(val).alias(out))
    )


def quantile_line(
    df: DataFrame,
    key_cols: list[str],
    x: Column,
    y: Column,
    tau_num: int = 3,
    tau_den: int = 4,
    rounds: int = 8,
    round_dp: int = 6,
) -> DataFrame:
    """``*key_cols, n, intercept, slope`` — the tau = tau_num/tau_den
    quantile line of integer ``y`` on integer ``x`` per key after
    ``rounds`` coordinate-descent rounds over median-centered x (each
    round = one slope step then one intercept step, after an initial
    intercept-only step at b = 0).  Rows with a null x or y are
    dropped (no point, no loss term).  Keys where every centered x is
    0 (constant x) emit slope NULL with the intercept at the plain
    tau-quantile of y — the mannkendall posture for the undefined
    coordinate.

    Eager: the cell frame and each half-step's parameter frame are
    localCheckpointed at call time (rounds are driver-side, the q250
    pattern), so construction runs 2*rounds + a few bounded jobs."""
    if not key_cols:
        raise ValueError(
            "key_cols must be non-empty (every selection joins on them); "
            "for a global fit, add a constant key column upstream"
        )
    if not (0 < int(tau_num) < int(tau_den)):
        raise ValueError(
            f"tau must be a proper fraction: got {tau_num}/{tau_den}"
        )
    if not (1 <= int(rounds) <= 12):
        raise ValueError(f"rounds must be in [1, 12], got {rounds!r}")
    reserved = {
        "n", "intercept", "slope",
        "_x", "_y", "_c", "_w", "_cum", "_t", "_p", "_m", "_xm",
        "_a6", "_b6", "_r6", "_s6",
    } & set(key_cols)
    if reserved:
        raise ValueError(
            f"key_cols collide with working columns: {sorted(reserved)}"
        )
    tn = F.lit(int(tau_num)).cast(_DEC)
    td = F.lit(int(tau_den)).cast(_DEC)

    raw = (
        df.select(
            *key_cols, x.cast("long").alias("_x"), y.cast("long").alias("_y")
        )
        .where(F.col("_x").isNotNull() & F.col("_y").isNotNull())
        .groupBy(*key_cols, "_x", "_y")
        .agg(F.count(F.lit(1)).cast(_DEC).alias("_c"))
        .transform(materialize)
    )
    # per-key integer median of x: smallest x with 2*cum >= n — the
    # same selection machinery, weight 2c against threshold n
    tot0 = raw.groupBy(*key_cols).agg(F.sum("_c").alias("n"))
    med = _weighted_quantile(
        raw.join(F.broadcast(tot0), key_cols)
        .groupBy(*key_cols, "_x", "n")
        .agg((F.sum("_c") * 2).alias("_w"))
        .withColumnRenamed("n", "_t"),
        key_cols,
        "_x",
        "_w",
        "_t",
        "_xm",
    )
    base = (
        raw.join(F.broadcast(med), key_cols)
        .select(
            *key_cols,
            (F.col("_x") - F.col("_xm")).alias("_x"),
            "_y",
            "_c",
        )
        .transform(materialize)
    )
    absx = F.abs(F.col("_x")).cast(_DEC)
    params = (
        base.groupBy(*key_cols)
        .agg(
            F.sum("_c").alias("n"),
            F.sum(
                F.when(F.col("_x") > 0, F.col("_c") * absx).otherwise(
                    F.lit(0).cast(_DEC)
                )
            ).alias("_p"),
            F.sum(
                F.when(F.col("_x") < 0, F.col("_c") * absx).otherwise(
                    F.lit(0).cast(_DEC)
                )
            ).alias("_m"),
        )
        .join(F.broadcast(med), key_cols)
        .withColumn("_a6", F.lit(None).cast(_DEC))
        .withColumn("_b6", F.lit(None).cast(_DEC))
        .transform(materialize)
    )

    def intercept_step(p: DataFrame) -> DataFrame:
        joined = base.join(F.broadcast(p), key_cols)
        cand = (
            joined.select(
                *key_cols,
                (
                    F.col("_y").cast(_DEC) * _MICRO
                    - F.coalesce(F.col("_b6"), F.lit(0).cast(_DEC))
                    * F.col("_x").cast(_DEC)
                ).alias("_r6"),
                F.col("_c"),
                (tn * F.col("n").cast(_DEC)).alias("_t"),
            )
            .groupBy(*key_cols, "_r6", "_t")
            .agg((F.sum("_c") * td).alias("_w"))
        )
        sel = _weighted_quantile(cand, key_cols, "_r6", "_w", "_t", "_a6x")
        return (
            p.drop("_a6")
            .join(sel, key_cols, "left")
            .withColumnRenamed("_a6x", "_a6")
            .transform(materialize)
        )

    def slope_step(p: DataFrame) -> DataFrame:
        joined = base.where(F.col("_x") != 0).join(F.broadcast(p), key_cols)
        s6 = F.round(
            (F.col("_y").cast(_DEC) * _MICRO - F.col("_a6")).cast("double")
            / F.col("_x").cast("double")
        ).cast(_DEC)
        cand = (
            joined.select(
                *key_cols,
                s6.alias("_s6"),
                (F.col("_c") * absx).alias("_cw"),
                (tn * F.col("_p") + (td - tn) * F.col("_m")).alias("_t"),
            )
            .groupBy(*key_cols, "_s6", "_t")
            .agg((F.sum("_cw") * td).alias("_w"))
        )
        sel = _weighted_quantile(cand, key_cols, "_s6", "_w", "_t", "_b6x")
        # a key misses the selection iff it has NO centered x != 0 rows
        # — a fact of the fixed cell frame, so its previous _b6 was NULL
        # too and the left join's NULL is the correct carry-forward
        return (
            p.drop("_b6")
            .join(sel, key_cols, "left")
            .withColumnRenamed("_b6x", "_b6")
            .transform(materialize)
        )

    params = intercept_step(params)  # a0 at b = 0
    for _ in range(int(rounds)):
        params = slope_step(params)
        params = intercept_step(params)

    micro = F.lit(float(_MICRO))
    # de-center exactly: a6_out = a6 - b6 * median, all decimal
    a6_out = F.col("_a6") - F.coalesce(
        F.col("_b6"), F.lit(0).cast(_DEC)
    ) * F.col("_xm").cast(_DEC)
    return params.select(
        *key_cols,
        F.col("n").cast("long").alias("n"),
        F.round(a6_out.cast("double") / micro, round_dp).alias("intercept"),
        F.round(F.col("_b6").cast("double") / micro, round_dp).alias("slope"),
    )
