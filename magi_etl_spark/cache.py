"""Result materialization keyed by config hash, with TTL + duplicate-work
suppression (SURVEY.md §4.3.1).

Mirrors the reference's Redis cache/lock semantics
(``run_queries_with_cache``, reference ``connectors.py:367-452``): result
keyed by the config's md5 (30-day TTL), a not-exists lock with its own TTL
so concurrent identical queries compute once.  Here the store is Parquet +
a JSON sidecar; the lock is an O_CREAT|O_EXCL lockfile.  On a cluster the
same layout works on any shared filesystem / object store prefix.
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

DEFAULT_TTL_SECONDS = 60 * 60 * 24 * 30  # reference connectors.py:381
LOCK_TTL_SECONDS = 3600  # reference connectors.py:416


class ResultCache:
    def __init__(
        self,
        root: str,
        ttl_seconds: int = DEFAULT_TTL_SECONDS,
        clock: Callable[[], float] = time.time,
    ):
        self.root = root
        self.ttl_seconds = ttl_seconds
        self.clock = clock  # injectable for deterministic tests
        os.makedirs(root, exist_ok=True)

    def _paths(self, key: str) -> tuple[str, str, str]:
        base = os.path.join(self.root, key)
        return base, base + ".meta.json", base + ".lock"

    def lookup(self, spark: SparkSession, key: str) -> DataFrame | None:
        path, meta, _ = self._paths(key)
        if not os.path.exists(meta):
            return None
        try:
            created = json.load(open(meta))["created_at"]
        except (ValueError, KeyError, OSError):
            return None
        if self.clock() - created > self.ttl_seconds:
            return None
        return spark.read.parquet(path)

    def _acquire_lock(self, lock: str) -> bool:
        # nx-with-expiry semantics: a stale lockfile (older than the lock
        # TTL) is broken, mirroring Redis set(nx=True, ex=3600)
        try:
            fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.write(fd, str(self.clock()).encode())
            os.close(fd)
            return True
        except FileExistsError:
            try:
                held_since = float(open(lock).read() or 0)
            except (OSError, ValueError):
                held_since = 0.0
            if self.clock() - held_since > LOCK_TTL_SECONDS:
                try:
                    os.unlink(lock)
                except FileNotFoundError:
                    pass
                return self._acquire_lock(lock)
            return False

    def get_or_compute(
        self,
        spark: SparkSession,
        key: str,
        compute: Callable[[], DataFrame],
        force_refresh: bool = False,
        wait_poll_seconds: float = 0.2,
        wait_timeout_seconds: float = 60.0,
    ) -> DataFrame:
        """Cache hit -> stored result; miss -> single-flight compute +
        materialize.  A losing concurrent caller polls for the winner's
        result (reference poll loop, ``connectors.py:444-449``)."""
        if not force_refresh:
            hit = self.lookup(spark, key)
            if hit is not None:
                return hit
        path, meta, lock = self._paths(key)
        if self._acquire_lock(lock):
            try:
                df = compute()
                df.write.mode("overwrite").parquet(path)
                json.dump({"created_at": self.clock(), "key": key}, open(meta, "w"))
            finally:
                try:
                    os.unlink(lock)
                except FileNotFoundError:
                    pass
            return spark.read.parquet(path)
        deadline = self.clock() + wait_timeout_seconds
        while self.clock() < deadline:
            hit = self.lookup(spark, key)
            if hit is not None:
                return hit
            time.sleep(wait_poll_seconds)
        raise TimeoutError(f"cache wait timed out for key {key}")

    def evict_expired(self) -> list[str]:
        """Delete expired materializations (TTL housekeeping the reference
        delegates to Redis expiry); returns the evicted keys."""
        import shutil

        evicted = []
        for meta_name in os.listdir(self.root):
            if not meta_name.endswith(".meta.json"):
                continue
            key = meta_name[: -len(".meta.json")]
            path, meta, _ = self._paths(key)
            try:
                created = json.load(open(meta))["created_at"]
            except (ValueError, KeyError, OSError):
                created = 0
            if self.clock() - created > self.ttl_seconds:
                shutil.rmtree(path, ignore_errors=True)
                try:
                    os.unlink(meta)
                except FileNotFoundError:
                    pass
                evicted.append(key)
        return evicted
