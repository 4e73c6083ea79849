"""Custom stateful streaming operator via ``applyInPandasWithState``
(the escape hatch when built-in watermarked aggs / session_window can't
express the semantics).

``running_user_stats`` keeps per-user state across micro-batches —
cumulative event count, cumulative value, last-seen timestamp — and emits
the updated row for every user touched in the batch.  State is explicit
and bounded (one tuple per user); a production variant pairs this with
state TTL via ``GroupStateTimeout``.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, total_events long, total_value double, last_seen timestamp"
)
STATE_SCHEMA = "total_events long, total_value double, last_seen timestamp"


def _update(
    key: tuple,
    batches: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    total_events, total_value, last_seen = (
        state.get if state.exists else (0, 0.0, None)
    )
    for pdf in batches:
        total_events += len(pdf)
        total_value += float(pdf["value"].sum())
        batch_max = pdf["ts"].max()
        if last_seen is None or batch_max > last_seen:
            last_seen = batch_max
    state.update((int(total_events), float(total_value), last_seen))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "total_events": [total_events],
            "total_value": [total_value],
            "last_seen": [last_seen],
        }
    )


def running_user_stats(events: DataFrame) -> DataFrame:
    """Per-user cumulative stats maintained as explicit group state."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- timeout-evicting sessionization (EventTimeTimeout) -------------------

SESSION_OUTPUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp,"
    " n_events long, total_value double"
)
SESSION_STATE_SCHEMA = "start_us long, last_us long, n long, total double"

_UNIT_MS = {
    "millisecond": 1, "milliseconds": 1,
    "second": 1_000, "seconds": 1_000,
    "minute": 60_000, "minutes": 60_000,
    "hour": 3_600_000, "hours": 3_600_000,
    "day": 86_400_000, "days": 86_400_000,
}


def _duration_ms(spec: str) -> int:
    n, unit = spec.strip().split()
    return int(n) * _UNIT_MS[unit.lower()]


def _epoch_us(s: pd.Series) -> pd.Series:
    """Event times as epoch MICROseconds — Spark's native timestamp
    resolution.  Flooring to ms here would make gap decisions (and the
    emitted session bounds) diverge from the batch sessionizer on
    sub-millisecond data."""
    if getattr(s.dtype, "tz", None) is not None:
        s = s.dt.tz_convert("UTC").dt.tz_localize(None)
    return s.astype("datetime64[us]").astype("int64")


def gap_sessions_event_timeout(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "0 seconds"
) -> DataFrame:
    """Gap-based sessionization with **state TTL eviction**: a user's
    session closes (and its state is dropped) either when a later event of
    the same user exceeds the gap, or — the part built-in aggregations
    can't express as explicit state — when the event-time watermark passes
    ``session_end + gap`` with no further activity (``EventTimeTimeout``).
    Emits one row per CLOSED session (append mode); open sessions hold
    exactly one state tuple until their timeout fires, so state size
    tracks concurrently-active users, never stream lifetime.

    The batch equivalent is the lag/cumsum gap sessionizer
    (``pipelines/trending.py`` A7/J4 family); tests assert the closed set
    matches it exactly.
    """
    gap_us = _duration_ms(gap) * 1000

    def update(
        key: tuple, batches: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        closed: list[tuple[int, int, int, float]] = []
        if state.hasTimedOut:
            closed.append(tuple(state.get))
            state.remove()
        else:
            cur: list | None = list(state.get) if state.exists else None
            rows: list[tuple[int, float]] = []
            for pdf in batches:
                rows.extend(
                    zip(_epoch_us(pdf["ts"]).tolist(), pdf["value"].tolist())
                )
            rows.sort()
            for us, v in rows:
                if cur is not None and us - cur[1] > gap_us:
                    closed.append(tuple(cur))
                    cur = None
                if cur is None:
                    cur = [us, us, 0, 0.0]
                # a cross-batch out-of-order event (watermark > 0s) can
                # land BEFORE the session's recorded start; lower it so
                # the emitted bounds match the batch lag/cumsum
                # sessionizer, which sees the full ordered history
                cur[0] = min(cur[0], us)
                cur[1] = max(cur[1], us)
                cur[2] += 1
                cur[3] += float(v)
            if cur is not None:
                state.update((int(cur[0]), int(cur[1]), int(cur[2]), float(cur[3])))
                # the timeout API is millisecond-resolution: CEIL so the
                # timer can never fire before the microsecond expiry, and
                # it must be strictly beyond the current watermark or
                # Spark rejects it
                timeout_ms = -((cur[1] + gap_us) // -1000)
                state.setTimeoutTimestamp(
                    max(timeout_ms, state.getCurrentWatermarkMs() + 1)
                )
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": pd.to_datetime(
                        [c[0] for c in closed], unit="us"
                    ),
                    "session_end": pd.to_datetime(
                        [c[1] for c in closed], unit="us"
                    ),
                    "n_events": [c[2] for c in closed],
                    "total_value": [c[3] for c in closed],
                }
            )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
