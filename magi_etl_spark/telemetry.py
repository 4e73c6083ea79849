"""Run-status / run-duration telemetry (reference
``dash_app/callbacks.py:103-136``).

The reference tracks each tool run in Redis: ``start_run_status`` stores
``{init_time, average_duration, progress_list_values}`` under
``{tool}:active_queries:{run_id}`` (30-minute TTL) and reads
``{tool}:run_durations`` — a list trimmed to the most recent 5 runs — to
show an ETA; ``end_run_status`` pushes the finished run's duration and
drops the status key (30-second linger).

Here the store is injectable (`KVStore` — any dict-like with TTL; the
in-memory default mirrors Redis semantics so tests run offline and a
redis client can be dropped in unchanged), and a documented
intent-deviation: the reference computes ``average_duration`` *after*
printing it and initializes it to 0 before the ``sum/len`` — so the ETA
it stores on the first call of a process is always ``0``; here the
average is computed before use.
"""

from __future__ import annotations

import json
import time
from collections.abc import Callable
from dataclasses import dataclass, field

KEEP_DURATIONS = 5
ACTIVE_TTL_SECONDS = 1800
LINGER_SECONDS = 30


class MemoryKV:
    """Redis-shaped in-memory store: string keys, JSON-string values,
    per-key expiry, left-push lists with trim.  Only the five calls the
    telemetry uses; an actual redis client satisfies the same contract."""

    def __init__(self, clock: Callable[[], float] = time.time):
        self.clock = clock
        self._kv: dict[str, tuple[str, float | None]] = {}
        self._lists: dict[str, list[str]] = {}

    def get(self, key: str) -> str | None:
        hit = self._kv.get(key)
        if hit is None:
            return None
        val, exp = hit
        if exp is not None and self.clock() > exp:
            del self._kv[key]
            return None
        return val

    def set(self, key: str, value: str, ex: float | None = None) -> None:
        self._kv[key] = (value, self.clock() + ex if ex else None)

    def expire(self, key: str, seconds: float) -> None:
        hit = self._kv.get(key)
        if hit is not None:
            self._kv[key] = (hit[0], self.clock() + seconds)

    def lpush(self, key: str, value: str) -> None:
        self._lists.setdefault(key, []).insert(0, value)

    def ltrim(self, key: str, start: int, stop: int) -> None:
        self._lists[key] = self._lists.get(key, [])[start : stop + 1]

    def lrange(self, key: str, start: int, stop: int) -> list[str]:
        lst = self._lists.get(key, [])
        return lst[start:] if stop == -1 else lst[start : stop + 1]


@dataclass
class RunTelemetry:
    """start/end run tracking with avg-of-recent-runs ETA."""

    store: MemoryKV = field(default_factory=MemoryKV)
    clock: Callable[[], float] = time.time

    def _durations_key(self, tool_key: str) -> str:
        return f"{tool_key}:run_durations"

    def _run_key(self, tool_key: str, run_id: str) -> str:
        return f"{tool_key}:active_queries:{run_id}"

    def average_duration(self, tool_key: str) -> float:
        """Mean of the most recent ``KEEP_DURATIONS`` run durations
        (seconds); 0.0 when no history exists."""
        raw = self.store.lrange(self._durations_key(tool_key), 0, -1)
        if not raw:
            return 0.0
        vals = [json.loads(v) for v in raw]
        return sum(vals) / len(vals)

    def start_run(
        self,
        tool_key: str,
        run_id: str,
        progress: list[str] | None = None,
    ) -> dict:
        """Record a run start; returns the stored status payload
        (``average_duration`` is the ETA from recent history)."""
        payload = {
            "init_time": self.clock(),
            "average_duration": self.average_duration(tool_key),
            "progress_list_values": progress or ["Loading..."],
        }
        self.store.set(
            self._run_key(tool_key, run_id),
            json.dumps(payload),
            ex=ACTIVE_TTL_SECONDS,
        )
        return payload

    def status(self, tool_key: str, run_id: str) -> dict | None:
        raw = self.store.get(self._run_key(tool_key, run_id))
        return json.loads(raw) if raw is not None else None

    def end_run(self, tool_key: str, run_id: str) -> float:
        """Record the run's duration into the recent-5 window and let the
        status key linger briefly (reference keeps it 30s for the UI's
        final poll).  Returns the measured duration in seconds."""
        raw = self.store.get(self._run_key(tool_key, run_id))
        if raw is None:
            raise KeyError(f"no active run {run_id!r} for {tool_key!r}")
        started = json.loads(raw)["init_time"]
        duration = self.clock() - started
        key = self._durations_key(tool_key)
        self.store.lpush(key, json.dumps(duration))
        self.store.ltrim(key, 0, KEEP_DURATIONS - 1)
        self.store.expire(self._run_key(tool_key, run_id), LINGER_SECONDS)
        return duration

    def track(self, tool_key: str, run_id: str):
        """Context manager: ``with telemetry.track("trending", rid): ...``"""
        return _Tracked(self, tool_key, run_id)


class _Tracked:
    def __init__(self, t: RunTelemetry, tool_key: str, run_id: str):
        self.t, self.tool_key, self.run_id = t, tool_key, run_id

    def __enter__(self):
        self.t.start_run(self.tool_key, self.run_id)
        return self

    def __exit__(self, *exc) -> None:
        self.t.end_run(self.tool_key, self.run_id)
