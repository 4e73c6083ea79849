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

from pyspark.sql import DataFrame, SparkSession


def enable_runtime_bloom(
    spark: SparkSession, application_side_min_bytes: int = 0
) -> None:
    """Turn on Catalyst's runtime Bloom-filter injection for shuffle
    joins.  ``applicationSideScanSizeThreshold`` defaults to 10 GiB —
    right for a real cluster, where building a bloom only pays off when
    the fact scan is large; test/bench deployments lower it so the rule
    is exercised.  Idempotent session confs, safe to call per query."""
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        str(application_side_min_bytes),
    )


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
    dim fits the broadcast threshold, so the plan is frozen once with
    broadcasting disabled: the optimized plan — bloom included — is
    materialized under the scoped conf and cached on the Dataset, then
    the session conf is restored so concurrent queries keep their
    broadcast joins.  On a real deployment with an oversized dim the
    scoping is a no-op (the rule fires on its own)."""
    spark = fact.sparkSession
    joined = fact.join(dim.hint("shuffle_merge"), on, how)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        # force logical optimization + physical planning NOW; both cache
        # on the Dataset, so later actions reuse the bloom-bearing plan
        joined._jdf.queryExecution().executedPlan()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    return joined
