"""Market-basket association: co-occurrence pairs with support / lift.

The classic "customers who bought X also bought Y" question over the
order/lineitem model (the reference's recommendation layer answers the
content-similarity variant; this is the transactional variant).  The
computation is a within-basket pair enumeration — the canonical trap is
doing it as an unconstrained self-join.  Here the join key IS the
basket id, so each task only pairs items within one basket, and basket
sizes are bounded by the data model (TPC-H orders carry <= 7 lines; a
retail basket is tens of items).  Pair state is O(sum of basket_size^2)
= O(rows * avg_basket), linear-ish in the input — the shape that
survives 100 TB.

For heavy-tailed basket sizes (a "basket" that is really a crawl dump),
cap enumeration with ``max_basket`` — baskets above it are dropped
whole, and the cap is reported by the caller's lint/log, not silently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from magi_etl_spark.chkpt import materialize


def copurchase_pairs(
    df: DataFrame,
    basket_col: str = "l_orderkey",
    item_col: str = "l_partkey",
    min_co: int = 2,
    max_basket: int | None = None,
) -> DataFrame:
    """Item pairs co-occurring in >= ``min_co`` baskets, with lift.

    Returns ``item_a, item_b, n_co, n_a, n_b, lift`` where
    ``item_a < item_b`` canonically, ``n_a``/``n_b`` are per-item basket
    counts, and ``lift = n_baskets * n_co / (n_a * n_b)`` (rounded to
    4) — > 1 means the pair co-occurs more than independence predicts.
    """
    baskets = df.select(
        F.col(basket_col).alias("_basket"), F.col(item_col).alias("_item")
    ).distinct()
    if max_basket is not None:
        sizes = baskets.groupBy("_basket").agg(F.count("*").alias("_sz"))
        baskets = baskets.join(
            sizes.filter(F.col("_sz") <= max_basket).select("_basket"), "_basket"
        )
    # r15 (guide §1.4/§5): the deduped basket frame feeds FIVE
    # downstream references (both pair-join sides, both per-item count
    # joins, the basket total) — left lazy each reference compiled its
    # own corpus scan + distinct exchange (5 live scans in the audit).
    # One barrier makes the distinct pass run once.
    baskets = materialize(baskets)
    a = baskets.select("_basket", F.col("_item").alias("item_a"))
    b = baskets.select("_basket", F.col("_item").alias("item_b"))
    co = (
        a.join(b, "_basket")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count("*").cast("long").alias("n_co"))
        .filter(F.col("n_co") >= min_co)
    )
    per_item = baskets.groupBy(F.col("_item")).agg(
        F.count("*").cast("long").alias("_n")
    )
    n_baskets = baskets.agg(
        F.count_distinct("_basket").cast("long").alias("_n_baskets")
    )
    return (
        co.join(per_item.select(F.col("_item").alias("item_a"), F.col("_n").alias("n_a")), "item_a")
        .join(per_item.select(F.col("_item").alias("item_b"), F.col("_n").alias("n_b")), "item_b")
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "item_a",
            "item_b",
            "n_co",
            "n_a",
            "n_b",
            F.round(
                F.col("_n_baskets") * F.col("n_co") / (F.col("n_a") * F.col("n_b")),
                4,
            ).alias("lift"),
        )
    )


def frequent_triples(
    df: DataFrame,
    basket_col: str = "l_orderkey",
    item_col: str = "l_partkey",
    min_support: int = 2,
) -> DataFrame:
    """A-priori step 3: item triples co-occurring in >= ``min_support``
    baskets — ``item_a < item_b < item_c, n_co``.

    The A-priori downward-closure prune runs FIRST: only items that are
    themselves frequent (>= min_support baskets) enter the triple
    enumeration, shrinking the within-basket join fan-out before any
    pair is formed — the lever that keeps candidate growth polynomial
    on heavy-tailed catalogs.  Enumeration then joins three copies of
    the pruned basket frame on the basket id (per-basket C(k,3) state,
    bounded by basket size), never item^3.
    """
    baskets = df.select(
        F.col(basket_col).alias("_basket"), F.col(item_col).alias("_item")
    ).distinct()
    frequent = (
        baskets.groupBy("_item")
        .agg(F.count("*").alias("_n"))
        .filter(F.col("_n") >= min_support)
        .select("_item")
    )
    # r15 (guide §1.4/§5): the pruned basket frame is the input to all
    # THREE self-join sides — left lazy each side compiled its own copy
    # of (corpus distinct + frequent-item agg + prune join): 6 live
    # corpus scans in the audit.  One barrier runs the prune once.
    pruned = materialize(baskets.join(frequent, "_item"))
    a = pruned.select("_basket", F.col("_item").alias("item_a"))
    b = pruned.select("_basket", F.col("_item").alias("item_b"))
    c = pruned.select("_basket", F.col("_item").alias("item_c"))
    return (
        a.join(b, "_basket")
        .filter(F.col("item_a") < F.col("item_b"))
        .join(c, "_basket")
        .filter(F.col("item_b") < F.col("item_c"))
        .groupBy("item_a", "item_b", "item_c")
        .agg(F.count("*").cast("long").alias("n_co"))
        .filter(F.col("n_co") >= min_support)
    )
