"""Streaming/batch sessionization parity at bench scale (sf0.1).

The stateful EventTimeTimeout sessionizer replays the full 100k-row
sf0.1 events table as four time-ordered micro-batches WITH late data —
a deterministic subset of events arrives one batch after its event-time
position — and the closed-session set must equal the batch lag/cumsum
gap sessionizer (q11's internal frame) restricted to the final
watermark.  This is the r3 VERDICT item 9: equivalence at bench scale
with real lateness, not just hand-built fixtures.

Late-data construction: only events that START a batch session (first
event of a user, or ts - prev > gap) and sit within 60 s before a chunk
boundary are delayed one batch.  Session-starting events are the provably
safe late set for an eagerly-emitting streaming sessionizer: a late
mid-session event could *bridge* two sessions the stream already split
on data evidence (an inherent limitation of emitting a closed session
before the watermark passes its gap), whereas a late session-START event
merges into exactly the session batch semantics assigns it — the
``cur[0] = min(...)`` lowering keeps its bounds right.  Lateness is
bounded by the 60 s window; the 2-minute watermark delay covers it.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import Window as W
from pyspark.sql import functions as F

SF01 = "/root/testdata/sf0.1"
GAP = "30 minutes"
GAP_US = 30 * 60 * 1_000_000
DELAY = "2 minutes"
DELAY_MS = 2 * 60 * 1000
LATE_WINDOW_US = 60 * 1_000_000


def _write_batch(path, pdf) -> None:
    table = pa.table(
        {
            "event_id": pa.array(pdf["event_id"], pa.int64()),
            "ts": pa.Array.from_pandas(
                pdf["ts"].astype("datetime64[us]"), type=pa.timestamp("us")
            ),
            "user_id": pa.array(pdf["user_id"], pa.int64()),
            "event_type": pa.array(pdf["event_type"], pa.string()),
            "value": pa.array(pdf["value"], pa.float64()),
            "props": pa.array(pdf["props"], pa.string()),
        }
    )
    pq.write_table(table, path)


def test_sf01_stream_sessions_match_batch_with_late_data(spark, tmp_path):
    from magi_etl_spark.streaming.events_stream import stream_events
    from magi_etl_spark.streaming.stateful import gap_sessions_event_timeout
    from magi_etl_spark.tables import load_table

    e = load_table(spark, SF01, "events")
    b1, b2, b3 = e.select(
        F.expr("percentile(unix_micros(ts), array(0.25, 0.5, 0.75))")
    ).first()[0]
    us = F.unix_micros("ts")
    chunk = (
        F.when(us <= b1, 0).when(us <= b2, 1).when(us <= b3, 2).otherwise(3)
    )
    uw = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev_us = F.lag(us).over(uw)
    starts_session = prev_us.isNull() | ((us - prev_us) > GAP_US)
    boundary = F.element_at(
        F.array(F.lit(int(b1)), F.lit(int(b2)), F.lit(int(b3))), chunk + 1
    )
    late = starts_session & (chunk < 3) & ((boundary - us) <= LATE_WINDOW_US)
    tagged = e.select(
        "*", late.alias("late"), (chunk + late.cast("int")).alias("arrival")
    )

    src = tmp_path / "src"
    src.mkdir()
    for k in range(4):
        pdf = (
            tagged.where(F.col("arrival") == k)
            .drop("arrival", "late")
            .orderBy("ts", "event_id")
            .toPandas()
        )
        assert len(pdf) > 0
        _write_batch(src / f"{k:02d}.parquet", pdf)
    n_late = tagged.where("late").count()
    assert n_late > 0, "late-data construction selected no events"

    stream = stream_events(spark, str(src), max_files_per_trigger=1)
    q = (
        gap_sessions_event_timeout(stream, gap=GAP, watermark=DELAY)
        .writeStream.format("memory")
        .queryName("sf01_closed_sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = spark.sql("select * from sf01_closed_sessions")

    # batch reference: the q11-family lag/cumsum sessionizer over ALL
    # events, closed = has a successor session (data path) OR the final
    # watermark passed end + gap (timeout path)
    sw = W.partitionBy("user_id").orderBy("ts", "event_id")
    sessions = (
        e.withColumn("prev", F.lag(us).over(sw))
        .withColumn(
            "new_s",
            (F.col("prev").isNull() | ((us - F.col("prev")) > GAP_US)).cast(
                "long"
            ),
        )
        .withColumn("sid", F.sum("new_s").over(sw))
        .groupBy("user_id", "sid")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
            F.sum("value").alias("total_value"),
        )
    )
    # Spark's watermark: floor(max event-time micros to ms) - delay
    max_us = e.agg(F.max(us)).first()[0]
    wm_ms = max_us // 1000 - DELAY_MS
    # the stateful op registers its timer at ceil_ms(end + gap)
    timeout_ms = F.expr(
        f"(unix_micros(session_end) + {GAP_US} + 999) div 1000"
    )
    sess_order = W.partitionBy("user_id").orderBy("session_start")
    classified = sessions.withColumn(
        "has_next", F.lead("session_start").over(sess_order).isNotNull()
    ).withColumn("timeout_ms", timeout_ms)
    # exclude exact watermark boundary ties (ms-resolution timer vs
    # watermark comparison semantics) from BOTH sides
    tied = F.abs(F.col("timeout_ms") - F.lit(wm_ms)) <= 1
    closed_batch = classified.where(
        (F.col("has_next") | (F.col("timeout_ms") <= F.lit(wm_ms))) & ~tied
    )

    def rows(df):
        return sorted(
            (
                r.user_id,
                r.session_start,
                r.session_end,
                r.n_events,
                round(r.total_value, 4),
            )
            for r in df.collect()
        )

    streamed_rows = rows(
        streamed.withColumn("timeout_ms", timeout_ms).where(~tied).drop(
            "timeout_ms"
        )
    )
    batch_rows = rows(closed_batch.select(
        "user_id", "session_start", "session_end", "n_events", "total_value"
    ))
    assert len(batch_rows) > 100  # bench scale, not a fixture
    assert streamed_rows == batch_rows

    # reconcile with the registered q11 surface: per user, closed + open
    # session counts must equal q11's n_sessions
    from magi_etl_spark.queries import QUERIES

    q11 = {
        r.user_id: (r.n_sessions, r.n_events)
        for r in QUERIES["q11_sessionize"](spark, SF01).collect()
    }
    per_user = {
        r.user_id: (r.n, r.ev)
        for r in classified.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("n_events").alias("ev"))
        .collect()
    }
    assert per_user == q11
