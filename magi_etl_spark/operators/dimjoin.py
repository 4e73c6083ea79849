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
    d = dim.select(
        F.col(key).alias("_dk"),
        F.col(valid_from).alias("_vf"),
        F.col(version_key).alias("_vk"),
        F.struct(*[F.col(a) for a in attrs]).alias("_attrs"),
    )
    fact_cols = facts.columns
    j = facts.join(
        d,
        (facts[key] == d["_dk"]) & (d["_vf"] <= facts[fact_time]),
        "left",
    )
    picked = j.groupBy(*[facts[c] for c in fact_cols]).agg(
        F.max_by(
            F.col("_attrs"), F.struct(F.col("_vf"), F.col("_vk"))
        ).alias("_best")
    )
    out = picked
    for a in attrs:
        out = out.withColumn(f"asof_{a}", F.col(f"_best.{a}"))
    return out.drop("_best")


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
