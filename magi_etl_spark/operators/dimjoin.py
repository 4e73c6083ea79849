"""Event-time dimension conformance: join facts to the dimension
version that was active WHEN THE FACT HAPPENED.

The SCD2 family (operators/scd2.py) builds interval dimensions and
answers point-in-time snapshots (q87/q93: "the dimension as of one
fixed timestamp").  This operator is the other half of the warehouse
pattern: every FACT row carries its own effective time, and each must
be enriched with the version valid at that instant — the canonical
"join sales to the price list in force on the sale date".

Semantics: for fact effective time ``t``, pick the dimension version
with the LARGEST ``(valid_from, version_key)`` among versions of the
same business key with ``valid_from <= t`` — i.e. a per-fact as-of
argmax, deterministic under same-day re-versioning because the unique
``version_key`` breaks the tie.  Facts older than every version stay
unmatched (left join, NULL attributes).

Scale shape: one equi-join on the BUSINESS key (co-partitioned — the
inequality is a post-join filter, not a join bound), fan-out bounded by
versions-per-key, then one ``max_by(struct)`` aggregation back to fact
grain.  No range-explode, no window over the fact stream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def asof_dimension_join(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    fact_time: str,
    valid_from: str = "valid_from",
    version_key: str = "version_key",
    attrs: list[str] | None = None,
) -> DataFrame:
    """Enrich ``facts`` with the as-of dimension attributes.

    ``dim`` must carry ``key, valid_from, version_key, *attrs``;
    ``facts`` keep all their columns plus one ``asof_<attr>`` column per
    requested attribute (NULL when no version predates the fact).

    Grain contract: output is at DISTINCT-fact-row grain — exact
    duplicate fact rows collapse into one (the pick-back aggregation
    groups on every fact column).  Callers that need duplicate
    multiplicity should pre-aggregate a count column; there is no
    hidden physical row id, so the result stays deterministic and
    oracle-replayable.
    """
    attrs = attrs or [
        c
        for c in dim.columns
        if c not in (key, valid_from, version_key)
    ]
    # r15 optimization (guide §2.3 "shuffle fewer bytes" / §3): the old
    # shape was a key-equi join with the time bound as a post-join
    # filter — every fact row fanned out by versions-per-key (~10x on
    # the q198 dimension) before a wide-key max_by collapsed it back.
    # The as-of pick is order-computable instead: union the version
    # rows and the fact rows, sort each business key by (time, kind,
    # version), and carry the latest version struct forward — one
    # shuffle of n_facts + n_versions rows, no multiplicative fan-out.
    # Dim rows order BEFORE fact rows at equal time (valid_from <= t is
    # inclusive), and among same-time versions (valid_from, version_key)
    # ascending puts the argmax last — exactly the old max_by winner.
    from pyspark.sql import Window as W

    fact_cols = facts.columns
    d = dim.where(F.col(key).isNotNull()).select(
        F.col(key).alias(key),
        F.col(valid_from).alias("_t"),
        F.lit(0).alias("_kind"),
        F.col(valid_from).alias("_vf"),
        F.col(version_key).alias("_vk"),
        F.struct(*[F.col(a) for a in attrs]).alias("_attrs"),
        *[F.lit(None).cast(facts.schema[c].dataType).alias(f"_f_{c}")
          for c in fact_cols],
    )
    f = facts.select(
        F.col(key).alias(key),
        F.col(fact_time).alias("_t"),
        F.lit(1).alias("_kind"),
        F.lit(None).cast(dim.schema[valid_from].dataType).alias("_vf"),
        F.lit(None).cast(dim.schema[version_key].dataType).alias("_vk"),
        F.lit(None)
        .cast(
            T.StructType(
                [T.StructField(a, dim.schema[a].dataType) for a in attrs]
            )
        )
        .alias("_attrs"),
        *[F.col(c).alias(f"_f_{c}") for c in fact_cols],
    )
    w = (
        W.partitionBy(key)
        .orderBy(
            F.col("_t").asc_nulls_first(),
            F.col("_kind").asc(),
            F.col("_vf").asc(),
            F.col("_vk").asc(),
        )
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    enriched = (
        d.unionByName(f)
        .withColumn("_best", F.last("_attrs", ignorenulls=True).over(w))
        .where(F.col("_kind") == 1)
    )
    out = enriched.select(
        *[F.col(f"_f_{c}").alias(c) for c in fact_cols],
        *[F.col(f"_best.{a}").alias(f"asof_{a}") for a in attrs],
    )
    return out.dropDuplicates(fact_cols)


def priority_dimension_from_orders(orders: DataFrame) -> DataFrame:
    """The demo SCD2 timeline synthesized from the orders history: each
    customer's order stream defines priority epochs — version i is
    (custkey, valid_from = o_orderdate, version_key = o_orderkey,
    priority)."""
    return orders.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderdate").alias("valid_from"),
        F.col("o_orderkey").alias("version_key"),
        F.col("o_orderpriority").alias("priority"),
    )
