"""Benjamini–Hochberg false-discovery-rate control (Benjamini &
Hochberg 1995) — the multiple-testing step every metrics platform needs
once it tests thousands of (segment, metric) hypotheses at once: the
per-test p-threshold that bounds the EXPECTED fraction of false
rejections at alpha, instead of Bonferroni's family-wise overkill.

Step-up rule over the ascending p-values p_(1) <= ... <= p_(m):

    k* = max { i : p_(i) <= (i / m) * alpha },    reject all p <= p_(k*)

Exactness: p-values arrive as integer micro-units (p_micro in
[0, 1_000_000]) and alpha as a rational (num, den), so the threshold
test is the pure-integer comparison

    p_micro * m * den  <=  i * num * 1_000_000

computed in decimal(38,0) (m can be billions; the product passes 2**63
— the q227 ssq lesson).  No float ever orders or thresholds anything,
and the rejection SET is tie-safe: ties of p_(k*) all satisfy
``p <= p_(k*)`` together regardless of how ranks split them.

Scale shape: the global ascending rank uses the two-pass
range-partitioned prefix rank (operators/prefix.py) — never a
single-partition window — then one scalar aggregate takes k* and the
threshold p, broadcast back for the per-row verdicts.

Scope note: the reference app has no multiple-testing surface — this
completes the experiment family (chi-square q208, KS q235, log-rank
q236, delta-method q237) with the readout-level correction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(38,0)"
_P_UNIT = 1_000_000


def bh_reject(
    df: DataFrame,
    p_col: str,
    id_cols: list[str],
    alpha_num: int,
    alpha_den: int,
    num_partitions: int | None = None,
) -> DataFrame:
    """All input columns + ``p_rank`` (1-based ascending rank of
    ``p_col``, ties broken by ``id_cols``) + ``rejected`` (boolean BH
    verdict at ``alpha_num/alpha_den``).  ``p_col`` holds integer
    micro-p-values in [0, 1_000_000]; null p-values are dropped (no
    evidence, no verdict).  ``num_partitions`` defaults to the
    session's ``spark.sql.shuffle.partitions`` — the global rank's
    range partitioning should ride the cluster's configured
    parallelism, not a fixed count that caps a 1000-executor job at
    32 tasks (the q211 derived-default posture applied to a
    parallelism knob; the rank itself is partitioning-independent, so
    the choice never changes results)."""
    from magi_etl_spark.operators.prefix import ranked_prefix_sum

    if num_partitions is None:
        # the conf can hold a non-integer sentinel on some platforms
        # (e.g. "auto" under AQE-managed shuffles) — a derived default
        # must degrade to the stock 200, not crash the query
        try:
            num_partitions = int(
                df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
            )
        except (TypeError, ValueError):
            num_partitions = 200
    base = df.where(F.col(p_col).isNotNull()).withColumn("_one", F.lit(1))
    ranked = ranked_prefix_sum(
        base,
        [F.asc(p_col)] + [F.asc(c) for c in id_cols],
        "_one",
        num_partitions=num_partitions,
        include_total=True,
    ).withColumnsRenamed({"rank": "p_rank", "total": "_m"})
    cond = F.col(p_col).cast(_DEC) * F.col("_m").cast(_DEC) * F.lit(
        alpha_den
    ).cast(_DEC) <= F.col("p_rank").cast(_DEC) * F.lit(alpha_num).cast(
        _DEC
    ) * F.lit(_P_UNIT).cast(_DEC)
    # k* and the threshold p: among satisfying ranks the LARGEST rank
    # carries the largest p (ranks ascend with p), so one scalar
    # aggregate yields both
    thr = ranked.agg(
        F.max(F.when(cond, F.col("p_rank"))).alias("k_star"),
        F.max(F.when(cond, F.col(p_col))).alias("_p_star"),
    )
    out_cols = [c for c in ranked.columns if c not in ("_one", "_cum", "_m", "cum")]
    return (
        ranked.join(F.broadcast(thr))
        .select(
            *out_cols,
            "k_star",
            F.coalesce(
                F.col(p_col) <= F.col("_p_star"), F.lit(False)
            ).alias("rejected"),
        )
    )


def bh_summary(
    df: DataFrame,
    p_col: str,
    id_cols: list[str],
    alpha_num: int,
    alpha_den: int,
    num_partitions: int | None = None,
) -> DataFrame:
    """One row: ``m, k_star, p_star_micro, n_rejected`` — the BH
    decision summary (k_star/p_star_micro NULL and n_rejected 0 when
    nothing clears the threshold)."""
    verdicts = bh_reject(
        df, p_col, id_cols, alpha_num, alpha_den, num_partitions
    )
    return verdicts.agg(
        F.count(F.lit(1)).alias("m"),
        F.max("k_star").alias("k_star"),
        F.max(F.when(F.col("rejected"), F.col(p_col))).alias("p_star_micro"),
        F.sum(F.col("rejected").cast("long")).alias("n_rejected"),
    )
