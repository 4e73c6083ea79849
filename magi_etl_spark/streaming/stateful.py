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
