"""Runtime Bloom-filter join pruning (semi-join reduction).

At warehouse scale the classic reduction for ``fact JOIN selective-dim``
is: build a Bloom filter over the dim side's join keys, ship it to the
fact scan, and drop fact rows that can't match BEFORE the shuffle — the
fact table never pays exchange cost for rows the join will discard.  The
reference delegates this to its warehouse's optimizer (every join in
``/root/reference/connectors.py`` queries runs remotely); Spark has the
same rewrite built in (``InjectRuntimeFilter``), so the engine's job is
to (a) switch it on with thresholds that match the deployment and (b)
shape the join so the rule applies (shuffle join, selective creation
side).  Nothing is reimplemented — Catalyst injects
``might_contain(bloom_filter_agg(keys), xxhash64(key))`` under the fact
scan, visible in the physical plan.

The filter is one-sided (no false negatives), so results are EXACTLY the
plain join's — the driver oracle proves it.
"""

from __future__ import annotations

import threading
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# serializes the conf-scoped plan freezes below: without it, two threads
# interleaving set/restore of the session-global broadcast threshold could
# leave "-1" behind permanently (captured-prev race)
_FREEZE_LOCK = threading.Lock()


def enable_runtime_bloom(
    spark: SparkSession, application_side_min_bytes: int = 0
) -> None:
    """Turn on Catalyst's runtime Bloom-filter injection for shuffle
    joins — a DEPLOYMENT-level opt-in that mutates the session: every
    later query plans under it.  ``applicationSideScanSizeThreshold``
    defaults to 10 GiB on a real cluster, where building a bloom only
    pays off when the fact scan is large.  For a per-query demonstration
    that leaves the session untouched, use ``freeze_bloom_plan`` (which
    scopes these confs itself) instead of calling this."""
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        str(application_side_min_bytes),
    )


_FREEZE_CONFS = {
    # the rule itself + the test-scale thresholds that let it fire, plus
    # broadcast off so the join is a shuffle join the rule will consider
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


def freeze_bloom_plan(spark: SparkSession, build: Callable[[], DataFrame]) -> DataFrame:
    """Build a COMPLETE query under a scoped conf window (bloom injection
    on with demonstration thresholds, broadcasting off) and force its
    physical plan, so the runtime Bloom filter Catalyst injects survives
    into the frame the caller actually executes — while the SESSION keeps
    its defaults: every conf is restored before returning, so queries
    planned after this one are unaffected (they'd otherwise inherit the
    aggressive zero application-side threshold order-dependently).

    The plan cache lives on the returned Dataset — deriving further
    frames from it (another groupBy, a count) re-plans under the restored
    confs and silently DROPS the bloom, so ``build`` must return the
    final frame.  The freeze is lock-serialized: interleaved set/restore
    from two threads could otherwise capture each other's scoped values
    and leave them behind permanently.  (A query planned by ANOTHER
    thread during the window still sees the scoped confs — keep freezes
    out of concurrent fan-outs, or accept a shuffle-join plan there.)"""
    with _FREEZE_LOCK:
        prev = {k: spark.conf.get(k, None) for k in _FREEZE_CONFS}
        for k, v in _FREEZE_CONFS.items():
            spark.conf.set(k, v)
        try:
            df = build()
            # force logical optimization + physical planning NOW; both
            # cache on the Dataset, so actions reuse the bloom-bearing plan
            df._jdf.queryExecution().executedPlan()
        finally:
            for k, v in prev.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)
    return df


def bloom_pruned_join(
    fact: DataFrame,
    dim: DataFrame,
    on,
    how: str = "inner",
) -> DataFrame:
    """``fact ⋈ dim`` shaped for runtime Bloom pruning.

    ``InjectRuntimeFilter`` only considers joins it can't plan as
    broadcast (a broadcast hash relation already filters; the bloom pays
    off exactly when the dim side is selective but PAST the broadcast
    threshold — the realistic 100 TB shape).  On test-scale data every
    dim fits the broadcast threshold, so the plan is frozen via
    ``freeze_bloom_plan``.  NOTE: the frozen plan is cached on the
    RETURNED frame only — callers composing further operators on top
    must wrap the whole composition in ``freeze_bloom_plan`` instead
    (as q81 does), or the derived frame re-plans without the bloom.
    On a real deployment with an oversized dim none of this is needed —
    the rule fires on its own."""
    return freeze_bloom_plan(
        fact.sparkSession, lambda: fact.join(dim.hint("shuffle_merge"), on, how)
    )
