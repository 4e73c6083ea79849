"""User-lifetime survival curves.

The cohort-retention family (q140) answers "how many of January's
users came back each week"; the survival curve answers the continuous
version: of all users, what fraction remained active at least t days
after their first touch.  With a complete observation window (every
lifespan fully observed in the data) the curve is the exact empirical
survival function — all-integer counts, one division per emitted
point; the right-censoring generalization (Kaplan-Meier) reduces to
the same counts when no user is censored, which is the deterministic
contract the oracle replays.

Scale shape: one keyed aggregate to per-user (first, last) days, one
bounded explode over each user's survived-day range (lifespans are
bounded by the observation window, exactly like the DAU/WAU/MAU
fan-out), one keyed count — never a window over the user stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def survival_curve(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    max_days: int = 30,
    round_dp: int = 6,
) -> DataFrame:
    """For t in 0..max_days: ``t_days, n_alive, n_users, survival`` —
    the fraction of users whose observed lifespan (last activity day
    minus first activity day) is at least t days.  survival(0) = 1 by
    construction; the curve is non-increasing."""
    spans = events.groupBy(F.col(user_col).alias("_u")).agg(
        F.datediff(F.max(F.to_date(ts_col)), F.min(F.to_date(ts_col)))
        .alias("_life")
    )
    alive = spans.select(
        F.explode(
            F.sequence(
                F.lit(0), F.least(F.col("_life"), F.lit(max_days))
            )
        ).alias("t_days")
    ).groupBy("t_days").agg(F.count("*").alias("n_alive"))
    total = spans.agg(F.count("*").alias("n_users"))
    return alive.join(F.broadcast(total)).select(
        "t_days",
        "n_alive",
        "n_users",
        F.round(
            F.col("n_alive").cast("double") / F.col("n_users"), round_dp
        ).alias("survival"),
    )
