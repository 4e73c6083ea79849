"""Engagement analytics over the event stream: rolling active-user
windows (DAU/WAU/MAU + stickiness), exponential time-decay scoring, and
sweep-line peak concurrency.

Reference parity: the reference's metric layer exposes rolling
distinct-user windows and decay-weighted engagement at the dashboard
tier (``dash_app/tasks.py``'s unique-user benchmark family); these are
the Spark-native equivalents, built to hold at 100 TB:

- Rolling distinct users does NOT self-join the event stream.  It first
  collapses events to distinct ``(user_id, day)`` pairs (orders of
  magnitude smaller), then explodes each pair across the days it can
  count toward — a bounded ×window_days fan-out of the SMALL frame —
  and takes conditional ``count_distinct`` per observation day.  One
  shuffle on the collapsed frame, one on the keyed aggregate.
- Decay scoring is a single keyed aggregation: the reference day rides
  the plan as a broadcast 1-row aggregate (no collect).
- Peak concurrency is the classic sweep line.  A global running sum is
  the "ORDER BY everything" trap, so the cumulative delta runs through
  :func:`magi_etl_spark.operators.prefix.ranked_prefix_sum` — the
  two-pass range-partitioned prefix sum (fully parallel, no
  single-partition window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rolling_active_users(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    windows: tuple[int, int, int] = (1, 7, 30),
) -> DataFrame:
    """Per activity day: distinct users active within trailing windows of
    ``windows`` days (default DAU / WAU / MAU) plus the DAU/MAU
    stickiness ratio.

    Only days that appear in the data are emitted (an observation day
    with zero activity has no DAU anchor — the standard dashboard
    convention, and it keeps the output keyed to real data).
    """
    d1, d7, d30 = windows
    longest = max(windows)
    user_days = events.select(
        F.col(user_col).alias("user_id"), F.to_date(ts_col).alias("day")
    ).distinct()
    active_days = user_days.select("day").distinct()
    covered = user_days.select(
        "user_id",
        "day",
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), longest - 1))
        ).alias("obs_day"),
    )
    # only observation days with their own activity count (broadcast the
    # tiny day list; a left-semi join keeps the fan-out frame narrow)
    covered = covered.join(
        F.broadcast(active_days.withColumnRenamed("day", "obs_day")),
        "obs_day",
        "left_semi",
    )
    age = F.datediff("obs_day", "day")
    out = covered.groupBy("obs_day").agg(
        F.count_distinct(F.when(age < d1, F.col("user_id"))).alias("dau"),
        F.count_distinct(F.when(age < d7, F.col("user_id"))).alias("wau"),
        F.count_distinct(F.when(age < d30, F.col("user_id"))).alias("mau"),
    )
    return out.select(
        F.col("obs_day").alias("day"),
        "dau",
        "wau",
        "mau",
        F.round(F.col("dau").cast("double") / F.col("mau"), 4).alias(
            "stickiness"
        ),
    )


def decay_engagement_scores(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    decay: float = 0.97,
) -> DataFrame:
    """Per user: exponentially time-decayed engagement score
    ``sum(round(value, 2) * decay^age_days)`` anchored at the newest day
    in the stream (a broadcast 1-row aggregate — the anchor rides the
    plan, no driver round-trip), plus the undecayed event count.

    The per-event term is a deterministic scalar expression; the final
    sum is rounded to 4 dp, well inside the float-sum reordering noise
    band for bench-scale magnitudes.
    """
    ref = events.agg(F.max(F.to_date(ts_col)).alias("_ref_day"))
    term = F.round(F.col(value_col), 2) * F.pow(
        F.lit(decay), F.datediff("_ref_day", F.to_date(ts_col))
    )
    return (
        events.join(F.broadcast(ref))
        .groupBy(F.col(user_col).alias("user_id"))
        .agg(
            F.round(F.sum(term), 4).alias("decay_score"),
            F.count("*").alias("n_events"),
        )
    )


def time_weighted_average(
    events: DataFrame,
    group_cols: list[str],
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    round_dp: int = 6,
) -> DataFrame:
    """Time-weighted average value per group (TWAP): each observation
    is weighted by the whole seconds until the group's NEXT observation
    (the step-function integral); the group's last observation carries
    no weight.  Weights and cent values are exact integers — one lead
    window per group, one division per output row.  Returns
    ``*group_cols, n_obs, total_seconds, twap``."""
    from pyspark.sql import Window as PW

    w = PW.partitionBy(*group_cols).orderBy(ts_col, id_col)
    staged = events.select(
        *group_cols,
        F.round(F.col(value_col) * 100).cast("long").alias("_cents"),
        (
            F.lead(F.col(ts_col).cast("long")).over(w)
            - F.col(ts_col).cast("long")
        ).alias("_dt"),
    ).where(F.col("_dt").isNotNull())
    return staged.groupBy(*group_cols).agg(
        F.count("*").alias("n_obs"),
        F.sum("_dt").alias("total_seconds"),
        F.round(
            F.sum(F.col("_cents") * F.col("_dt")).cast("double")
            / F.sum("_dt")
            / 100.0,
            round_dp,
        ).alias("twap"),
    )


def concurrency_profile(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    num_partitions: int = 32,
) -> DataFrame:
    """Peak concurrent user-day sessions per hour, by sweep line.

    Each ``(user, day)`` pair contributes one interval
    ``[min(ts), max(ts) + 1s)`` (end-exclusive, so zero-length sessions
    still occupy one second).  The sweep emits +1/-1 deltas, takes the
    GLOBAL running sum through the range-partitioned prefix sum (no
    single-partition window), and reports the per-hour maximum of the
    running concurrency together with the number of session starts in
    that hour.

    The prefix-sum order key ``(ts, delta, user_id, day)`` is unique —
    each (user, day) emits exactly one +1 and one -1 — and sorts ends
    (-1) before starts (+1) at the same instant, matching the
    end-exclusive interval semantics.
    """
    from magi_etl_spark.operators.prefix import ranked_prefix_sum

    sessions = (
        events.select(
            F.col(user_col).alias("user_id"),
            F.to_date(ts_col).alias("day"),
            F.col(ts_col).alias("_t"),
        )
        .groupBy("user_id", "day")
        .agg(F.min("_t").alias("start_ts"), F.max("_t").alias("end_ts"))
    )
    deltas = sessions.select(
        F.col("start_ts").alias("ts"),
        F.lit(1).alias("delta"),
        "user_id",
        "day",
    ).unionByName(
        sessions.select(
            (F.col("end_ts") + F.expr("INTERVAL 1 SECOND")).alias("ts"),
            F.lit(-1).alias("delta"),
            "user_id",
            "day",
        )
    )
    swept = ranked_prefix_sum(
        deltas,
        order=[F.col("ts"), F.col("delta"), F.col("user_id"), F.col("day")],
        value_col="delta",
        num_partitions=num_partitions,
    )
    # output grain is (date, hour-of-day) INTEGERS, not a raw truncated
    # timestamp: collect()/toPandas render timestamps through the PYTHON
    # process timezone (not the UTC-pinned session), so a timestamp
    # output column would shift under a non-UTC driver host
    return (
        swept.groupBy(
            F.to_date("ts").alias("day"),
            F.hour("ts").cast("int").alias("hour_of_day"),
        )
        .agg(
            F.max("cum").alias("peak_concurrency"),
            F.sum(F.when(F.col("delta") == 1, 1).otherwise(0)).alias(
                "session_starts"
            ),
        )
        .withColumn("peak_concurrency", F.col("peak_concurrency").cast("long"))
        .withColumn("session_starts", F.col("session_starts").cast("long"))
    )
