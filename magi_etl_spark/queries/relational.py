"""Relational operator inventory (SURVEY.md §2.2-§2.8).

Every operator class the reference's SQL templates exercise, re-expressed
as DataFrame programs over the generic test tables.  Reference citations in
each docstring point at the construct being covered.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from magi_etl_spark.queries import query
from magi_etl_spark.tables import load_table


def cents(col: F.Column, scale: int = 100) -> F.Column:
    """Exact integer money: round(x*scale) as bigint. Keeps big sums
    order-independent (double summation order differs between engines)."""
    return F.round(col * F.lit(scale)).cast("long")


# ---------------------------------------------------------------------------
# Aggregation core
# ---------------------------------------------------------------------------


@query(
    "q01_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           SUM(l_quantity) AS sum_qty,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_price_c,
           CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT)
               AS sum_disc_price_c4,
           AVG(l_quantity) AS avg_qty,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) <= DATE '2000-12-01'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped multi-aggregate scan (reference A4/A6/A8 pattern:
    ``dash_app/tasks.py:1758-1767`` metric rollup CTE)."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.where(F.to_date("l_shipdate") <= F.lit("2000-12-01").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum(cents(F.col("l_extendedprice"))).alias("sum_base_price_c"),
            F.sum(cents(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000)).alias(
                "sum_disc_price_c4"
            ),
            F.avg("l_quantity").alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "q02_filter_project",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS price_c,
           CAST(l_shipdate AS DATE) AS ship_date
    FROM lineitem
    WHERE l_returnflag = 'R'
      AND l_quantity >= 45
      AND CAST(l_shipdate AS DATE) BETWEEN DATE '1996-01-01' AND DATE '1997-12-31'
    """,
)
def q02_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + conjunctive predicates incl. date-range (reference P1/P2/P4:
    ``dash_app/tasks.py:600`` date between, ``1765`` equality filters).
    Filters and the 4-column projection push into the parquet scan."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.where(
            (F.col("l_returnflag") == "R")
            & (F.col("l_quantity") >= 45)
            & F.to_date("l_shipdate").between("1996-01-01", "1997-12-31")
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            cents(F.col("l_extendedprice")).alias("price_c"),
            F.to_date("l_shipdate").alias("ship_date"),
        )
    )


@query(
    "q03_top_orders",
    oracle="""
    SELECT o.o_orderkey,
           CAST(o.o_orderdate AS DATE) AS order_date,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT)) AS BIGINT)
               AS revenue_c4
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY o.o_orderkey, order_date
    ORDER BY revenue_c4 DESC, o.o_orderkey
    LIMIT 10
    """,
)
def q03_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way join + grouped agg + deterministic global top-K (reference
    J2 dim join + O2 ``order by ... desc limit 20``, ``dash_app/tasks.py:1852-1866``).

    Join shape: the segment filter shrinks customer 5x, so orders⋈customer
    is reduced FIRST and broadcast into the fact scan — the big table is
    never shuffled (measured ~2x over the shuffle-join order).  The hint
    assumes the filtered order list fits in executor memory; at a scale
    where it doesn't, drop the hint and AQE picks the shuffle strategy."""
    c = load_table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    oc = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        "o_orderkey", "o_orderdate"
    )
    return (
        l.join(F.broadcast(oc), l.l_orderkey == oc.o_orderkey)
        .groupBy("o_orderkey", F.to_date("o_orderdate").alias("order_date"))
        .agg(
            F.sum(cents(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000)).alias(
                "revenue_c4"
            )
        )
        .orderBy(F.desc("revenue_c4"), "o_orderkey")
        .limit(10)
    )


@query(
    "q05_region_revenue",
    oracle="""
    SELECT n.n_name,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT)) AS BIGINT)
               AS revenue_c4
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN supplier s ON s.s_nationkey = n.n_nationkey
    JOIN lineitem l ON l.l_suppkey = s.s_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    WHERE r.r_name IN ('AFRICA', 'AMERICA')
      AND CAST(o.o_orderdate AS DATE) >= DATE '1996-01-01'
    GROUP BY n.n_name
    """,
)
def q05_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join across all dims (reference J2 broadcast-dimension joins,
    ``dash_app/dash_app.py:526-529``).  Dims are broadcast; only the
    fact-fact join shuffles."""
    r = load_table(spark, sf_dir, "region").where(F.col("r_name").isin("AFRICA", "AMERICA"))
    n = load_table(spark, sf_dir, "nation")
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        F.to_date("o_orderdate") >= F.lit("1996-01-01").cast("date")
    )
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.sum(cents(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000)).alias(
                "revenue_c4"
            )
        )
    )


# ---------------------------------------------------------------------------
# Join forms
# ---------------------------------------------------------------------------


@query(
    "q06_semi_join",
    oracle="""
    SELECT o_orderkey, CAST(ROUND(o_totalprice * 100) AS BIGINT) AS total_price_c
    FROM orders
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_quantity >= 49)
    """,
)
def q06_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join via IN-subquery (reference J7, ``dash_app/tasks.py:1878``:
    ``wiki_name in (select wiki_name from top_20_total)``)."""
    o = load_table(spark, sf_dir, "orders")
    big = load_table(spark, sf_dir, "lineitem").where(F.col("l_quantity") >= 49)
    return o.join(big, o.o_orderkey == big.l_orderkey, "left_semi").select(
        "o_orderkey", cents(F.col("o_totalprice")).alias("total_price_c")
    )


@query(
    "q07_anti_join",
    oracle="""
    SELECT c.c_custkey, c.c_name, c.c_nationkey
    FROM customer c
    WHERE c.c_custkey NOT IN (SELECT o_custkey FROM orders)
    """,
)
def q07_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join exclusion list (reference J8 ignore-list,
    ``dash_app/tasks.py:2705``: ``~df['wiki_id'].isin(ignore_df['wiki_id'])``)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_nationkey"
    )


@query(
    "q08_full_outer_cast_keys",
    oracle="""
    WITH per_cust AS (
        SELECT CAST(o_custkey AS VARCHAR) AS cust_key, COUNT(*) AS order_cnt
        FROM orders GROUP BY cust_key
    )
    SELECT COALESCE(p.cust_key, CAST(c.c_custkey AS VARCHAR)) AS cust_key,
           c.c_name, COALESCE(p.order_cnt, 0) AS order_cnt
    FROM per_cust p
    FULL OUTER JOIN customer c ON p.cust_key = CAST(c.c_custkey AS VARCHAR)
    """,
)
def q08_full_outer_cast_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer join on string-cast keys (reference J1: events full-outer
    taxonomy on varchar-cast compound keys, ``dash_app/dash_app.py:519-525``)."""
    per_cust = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").cast("string").alias("cust_key"))
        .agg(F.count("*").alias("order_cnt"))
    )
    c = load_table(spark, sf_dir, "customer").withColumn(
        "c_key", F.col("c_custkey").cast("string")
    )
    return per_cust.join(c, per_cust.cust_key == c.c_key, "full").select(
        F.coalesce(per_cust.cust_key, c.c_key).alias("cust_key"),
        "c_name",
        F.coalesce("order_cnt", F.lit(0)).alias("order_cnt"),
    )


# ---------------------------------------------------------------------------
# Windows / top-k per group
# ---------------------------------------------------------------------------


@query(
    "q09_top1_per_group",
    oracle="""
    WITH agg AS (
        SELECT l_suppkey, l_partkey, SUM(l_quantity) AS qty
        FROM lineitem GROUP BY l_suppkey, l_partkey
    ), ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY l_suppkey ORDER BY qty DESC, l_partkey) AS rn
        FROM agg
    )
    SELECT l_suppkey, l_partkey, qty FROM ranked WHERE rn = 1
    """,
)
def q09_top1_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number top-1-per-group dedupe (reference W1 dominant-wiki pick,
    ``dash_app/tasks.py:1796-1823``).

    One shuffle, not two: pre-partitioning on l_suppkey satisfies both the
    (suppkey, partkey) group-by clustering AND the window's partitioning,
    so the agg and the window share the same exchange.  Only safe when the
    partition key has enough cardinality to keep all cores busy (1000
    suppliers here; don't do this for a 5-value key)."""
    l = load_table(spark, sf_dir, "lineitem").repartition("l_suppkey")
    agg = l.groupBy("l_suppkey", "l_partkey").agg(F.sum("l_quantity").alias("qty"))
    w = W.partitionBy("l_suppkey").orderBy(F.desc("qty"), F.asc("l_partkey"))
    return (
        agg.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("l_suppkey", "l_partkey", "qty")
    )


@query(
    "q10_topk_per_group",
    oracle="""
    WITH agg AS (
        SELECT p.p_brand, l.l_partkey,
               CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT)) AS BIGINT)
                   AS revenue_c4
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY p.p_brand, l.l_partkey
    ), ranked AS (
        SELECT *, RANK() OVER (PARTITION BY p_brand ORDER BY revenue_c4 DESC, l_partkey) AS rnk
        FROM agg
    )
    SELECT p_brand, l_partkey, revenue_c4, rnk FROM ranked WHERE rnk <= 3
    """,
)
def q10_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank() top-K-per-group (reference W2 top-20-pages-per-wiki,
    ``dash_app/tasks.py:1898-1924``)."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    agg = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand", "l_partkey")
        .agg(
            F.sum(cents(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000)).alias(
                "revenue_c4"
            )
        )
    )
    w = W.partitionBy("p_brand").orderBy(F.desc("revenue_c4"), F.asc("l_partkey"))
    return agg.withColumn("rnk", F.rank().over(w)).where(F.col("rnk") <= 3)


# ---------------------------------------------------------------------------
# Events: sessionization, conditional aggs, derived keys, JSON
# ---------------------------------------------------------------------------


@query(
    "q11_sessionize",
    oracle="""
    WITH ordered AS (
        SELECT user_id, ts,
               LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        FROM events
    ), flagged AS (
        SELECT user_id,
               CASE WHEN prev_ts IS NULL
                         OR date_diff('second', prev_ts, ts) > 1800 THEN 1 ELSE 0 END AS is_new
        FROM ordered
    )
    SELECT user_id,
           CAST(SUM(is_new) AS BIGINT) AS n_sessions,
           COUNT(*) AS n_events
    FROM flagged GROUP BY user_id
    """,
)
def q11_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (reference A7/J4 session duration via
    min/max(event_time) + ``date_diff('second', ...)``,
    ``dash_app/tasks.py:1988-1996``; 30-min gap is the classic web rule).
    One shuffle on user_id serves both the window and the final group-by."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = e.withColumn("prev_ts", F.lag("ts").over(w)).withColumn(
        "is_new",
        F.when(
            F.col("prev_ts").isNull()
            | ((F.unix_timestamp("ts") - F.unix_timestamp("prev_ts")) > 1800),
            1,
        ).otherwise(0),
    )
    return flagged.groupBy("user_id").agg(
        F.sum("is_new").alias("n_sessions"), F.count("*").alias("n_events")
    )


@query(
    "q12_conditional_agg",
    oracle="""
    SELECT CAST(ts AS DATE) AS day,
           COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchases,
           COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS errors,
           CAST(SUM(CASE WHEN event_type = 'purchase'
                         THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT)
               AS purchase_value_c,
           COUNT(DISTINCT user_id) AS daily_users
    FROM events
    GROUP BY day
    """,
)
def q12_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional counts + exact distinct users per day (reference A5
    ``count(case when event_type like 'pageview' then 1 end)``,
    ``dash_app/tasks.py:1762``; A1 ``count(distinct amplitude_id)``,
    ``dash_app/dash_app.py:389``)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.count(F.when(F.col("event_type") == "purchase", 1)).alias("purchases"),
            F.count(F.when(F.col("event_type") == "error", 1)).alias("errors"),
            F.sum(
                F.when(F.col("event_type") == "purchase", cents(F.col("value"))).otherwise(0)
            ).alias("purchase_value_c"),
            F.countDistinct("user_id").alias("daily_users"),
        )
    )


@query(
    "q13_distinct_derived_key",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT CONCAT(CAST(user_id AS VARCHAR), '-', CAST(CAST(ts AS DATE) AS VARCHAR)))
               AS user_days
    FROM events
    GROUP BY event_type
    """,
)
def q13_distinct_derived_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct count over a concat-derived key (reference A2 session key
    ``count(distinct concat(device_id,'-',session_id))``, ``dash_app/tasks.py:1761``)."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.countDistinct(
            F.concat_ws("-", F.col("user_id").cast("string"), F.to_date("ts").cast("string"))
        ).alias("user_days")
    )


@query(
    "q14_json_extract",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
           COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS value_c
    FROM events
    GROUP BY k_bucket
    """,
)
def q14_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction from a string column (reference semi-structured
    cell parsing, ``dash_app/tasks.py:290-313`` -> from_json/get_json_object)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.withColumn("k_bucket", F.get_json_object("props", "$.k").cast("long") % 10)
        .groupBy("k_bucket")
        .agg(
            F.count("*").alias("n"),
            F.sum(cents(F.col("value"))).alias("value_c"),
        )
    )


# ---------------------------------------------------------------------------
# Having, set ops, normalization, calendar buckets
# ---------------------------------------------------------------------------


@query(
    "q15_having_threshold",
    oracle="""
    SELECT * FROM (
        SELECT c_nationkey, COUNT(*) AS n_customers,
               CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS total_bal_c
        FROM customer GROUP BY c_nationkey
    ) WHERE n_customers >= 50
    """,
)
def q15_having_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation threshold filter (reference P7 min-metric cutoff,
    ``dash_app/dash_app.py:1238-1239``)."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.groupBy("c_nationkey")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum(cents(F.col("c_acctbal"))).alias("total_bal_c"),
        )
        .where(F.col("n_customers") >= 50)
    )


@query(
    "q16_set_ops",
    oracle="""
    SELECT 'both' AS side, n_nationkey FROM (
        SELECT DISTINCT c_nationkey AS n_nationkey FROM customer
        INTERSECT
        SELECT DISTINCT s_nationkey FROM supplier
    )
    UNION ALL
    SELECT 'customer_only' AS side, n_nationkey FROM (
        SELECT DISTINCT c_nationkey AS n_nationkey FROM customer
        EXCEPT
        SELECT DISTINCT s_nationkey FROM supplier
    )
    """,
)
def q16_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT / UNION ALL (reference U1-U3 set semantics,
    ``dash_app/tasks.py:971-972``, ``2132-2134``)."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("n_nationkey")
    ).distinct()
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("n_nationkey")
    ).distinct()
    both = c.intersect(s).select(F.lit("both").alias("side"), "n_nationkey")
    only = c.exceptAll(s).select(F.lit("customer_only").alias("side"), "n_nationkey")
    return both.unionByName(only)


@query(
    "q17_minmax_normalize",
    oracle="""
    WITH stats AS (
        SELECT c_nationkey, MIN(c_acctbal) AS mn, MAX(c_acctbal) AS mx
        FROM customer GROUP BY c_nationkey
    )
    SELECT c.c_custkey,
           ROUND(CASE WHEN s.mx = s.mn THEN 0.0
                      ELSE (c.c_acctbal - s.mn) / (s.mx - s.mn) END, 6) AS bal_norm
    FROM customer c JOIN stats s ON c.c_nationkey = s.c_nationkey
    """,
)
def q17_minmax_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-max normalization by group (reference popularity scaling,
    ``dash_app/tasks.py:506-511``).  Expressed as a window-free agg + broadcast
    join back, which scales better than a global collect."""
    c = load_table(spark, sf_dir, "customer")
    stats = c.groupBy(F.col("c_nationkey").alias("nk")).agg(
        F.min("c_acctbal").alias("mn"), F.max("c_acctbal").alias("mx")
    )
    return (
        c.join(F.broadcast(stats), c.c_nationkey == stats.nk)
        .select(
            "c_custkey",
            F.round(
                F.when(F.col("mx") == F.col("mn"), F.lit(0.0)).otherwise(
                    (F.col("c_acctbal") - F.col("mn")) / (F.col("mx") - F.col("mn"))
                ),
                6,
            ).alias("bal_norm"),
        )
    )


@query(
    "q45_nation_pair_volume",
    oracle="""
    SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INTEGER) AS ship_year,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT)) AS BIGINT)
               AS revenue_c4
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation ns ON ns.n_nationkey = s.s_nationkey
    JOIN nation nc ON nc.n_nationkey = c.c_nationkey
    WHERE (ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2')
       OR (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1')
    GROUP BY supp_nation, cust_nation, ship_year
    """,
)
def q45_nation_pair_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bidirectional nation-pair shipping volume by year (TPC-H Q7-class:
    disjunctive cross-table predicate + multi-join + yearly rollup)."""
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    ns = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    nc = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("c_nk"))
        .where(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("ship_year")
        )
        .agg(
            F.sum(cents(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000)).alias(
                "revenue_c4"
            )
        )
    )


@query(
    "q48_market_share",
    oracle="""
    WITH enriched AS (
        SELECT CAST(year(o.o_orderdate) AS INTEGER) AS order_year,
               n.n_name AS supp_nation,
               CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT)
                   AS rev_c4
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
    )
    SELECT order_year,
           ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN rev_c4 ELSE 0 END) AS BIGINT)
                 / CAST(SUM(rev_c4) AS BIGINT), 6) AS nation3_share,
           CAST(SUM(rev_c4) AS BIGINT) AS total_rev_c4
    FROM enriched GROUP BY order_year
    """,
)
def q48_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-share ratio per year (TPC-H Q8-class: conditional-sum over
    total-sum).  Both sums are exact integer cents, so the share double is
    bit-identical across engines."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    rev = cents(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000)
    enriched = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            F.year("o_orderdate").alias("order_year"),
            F.col("n_name").alias("supp_nation"),
            rev.alias("rev_c4"),
        )
    )
    nation3 = F.sum(F.when(F.col("supp_nation") == "NATION_3", F.col("rev_c4")).otherwise(0))
    total = F.sum("rev_c4")
    return enriched.groupBy("order_year").agg(
        F.round(nation3 / total, 6).alias("nation3_share"),
        total.alias("total_rev_c4"),
    )


@query(
    "q46_above_avg_customers",
    oracle="""
    WITH stats AS (
        SELECT c_nationkey, AVG(c_acctbal) AS avg_bal
        FROM customer WHERE c_acctbal > 0 GROUP BY c_nationkey
    )
    SELECT c.c_custkey, c.c_nationkey,
           CAST(ROUND(c.c_acctbal * 100) AS BIGINT) AS bal_c,
           ROUND(s.avg_bal, 6) AS nation_avg_bal
    FROM customer c JOIN stats s ON c.c_nationkey = s.c_nationkey
    WHERE c.c_acctbal > s.avg_bal
    """,
)
def q46_above_avg_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-subquery pattern (TPC-H Q22-class: value above the
    group's aggregate) decorrelated into an agg + broadcast join-back."""
    c = load_table(spark, sf_dir, "customer")
    stats = (
        c.where(F.col("c_acctbal") > 0)
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.avg("c_acctbal").alias("avg_bal"))
    )
    return (
        c.join(F.broadcast(stats), c.c_nationkey == stats.nk)
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .select(
            "c_custkey",
            "c_nationkey",
            cents(F.col("c_acctbal")).alias("bal_c"),
            F.round("avg_bal", 6).alias("nation_avg_bal"),
        )
    )


@query(
    "q18_week_buckets",
    oracle="""
    SELECT CAST(date_trunc('week', ts) AS DATE) AS week_start,
           event_type,
           COUNT(*) AS n,
           COUNT(DISTINCT user_id) AS users
    FROM events
    GROUP BY week_start, event_type
    """,
)
def q18_week_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar bucketing (reference AnchorCalendar period derivations +
    ``gen_date_intervals``, ``biutils.py:117-141``, ``467-483``)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_trunc("week", F.col("ts")).cast("date").alias("week_start"),
            "event_type",
        )
        .agg(F.count("*").alias("n"), F.countDistinct("user_id").alias("users"))
    )


@query(
    "q52_min_cost_supplier",
    oracle="""
    WITH eu AS (
        SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
        FROM supplier s
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'EUROPE'
    )
    SELECT DISTINCT p.p_partkey, p.p_name, e.s_name, e.n_name,
           CAST(ROUND(e.s_acctbal * 100) AS BIGINT) AS bal_c,
           CAST(ROUND(l.l_extendedprice * 100) AS BIGINT) AS price_c
    FROM part p
    JOIN lineitem l ON p.p_partkey = l.l_partkey
    JOIN eu e ON l.l_suppkey = e.s_suppkey
    WHERE p.p_size <= 10
      AND l.l_extendedprice = (
          SELECT MIN(l2.l_extendedprice)
          FROM lineitem l2 JOIN eu e2 ON l2.l_suppkey = e2.s_suppkey
          WHERE l2.l_partkey = p.p_partkey
      )
    """,
)
def q52_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2-class nested subquery: the cheapest EUROPE supplier per
    small part, where the min-price subquery is itself correlated through
    the same region-restricted supplier set (second correlation level).

    Decorrelated Spark-first: the region-restricted supplier dim reduces
    once and broadcasts into the fact scan; the correlated MIN becomes a
    window MIN over the same reduced frame (partitioned by partkey), so
    the fact is scanned AND shuffled exactly once — the aggregate-and-
    join-back form would be a diamond that re-executes the scan."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    p = load_table(spark, sf_dir, "part")
    l = load_table(spark, sf_dir, "lineitem")
    eu = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r.where(F.col("r_name") == "EUROPE")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    offers = (
        l.join(F.broadcast(eu), l.l_suppkey == F.col("s_suppkey"))
        .select("l_partkey", "s_name", "s_acctbal", "n_name", "l_extendedprice")
    )
    from pyspark.sql import Window as W

    small = p.where(F.col("p_size") <= 10).select("p_partkey", "p_name")
    best = offers.withColumn(
        "min_price",
        F.min("l_extendedprice").over(W.partitionBy("l_partkey")),
    ).where(F.col("l_extendedprice") == F.col("min_price"))
    return (
        best.join(F.broadcast(small), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            "p_partkey", "p_name", "s_name", "n_name",
            cents(F.col("s_acctbal")).alias("bal_c"),
            cents(F.col("l_extendedprice")).alias("price_c"),
        )
        .distinct()
    )


@query(
    "q53_dominant_supplier",
    oracle="""
    SELECT s.s_name, n.n_name
    FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE EXISTS (
        SELECT 1 FROM part p
        WHERE p.p_name LIKE 'small%'
          AND p.p_partkey IN (
              SELECT l.l_partkey FROM lineitem l
              WHERE l.l_suppkey = s.s_suppkey
                AND l.l_shipdate >= DATE '1996-01-01'
                AND l.l_shipdate <  DATE '1997-01-01'
              GROUP BY l.l_partkey
              HAVING SUM(l.l_quantity) > 0.3 * (
                  SELECT SUM(l2.l_quantity) FROM lineitem l2
                  WHERE l2.l_partkey = l.l_partkey
                    AND l2.l_shipdate >= DATE '1996-01-01'
                    AND l2.l_shipdate <  DATE '1997-01-01')
          )
    )
    """,
)
def q53_dominant_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20-class EXISTS chain: suppliers who shipped more than 30%
    of 1996's total quantity of some 'small%' part — a two-level
    correlated EXISTS/IN/HAVING nest.

    Decorrelated Spark-first: one filtered scan of the year's lineitems
    aggregates to (part, supplier) grain; the per-part total is a window
    SUM over that grain (no second fact pass); the EXISTS levels
    collapse to broadcast LEFT SEMI joins, so the supplier table is
    filtered without duplication and the fact scans and shuffles once."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    p = load_table(spark, sf_dir, "part")
    l = load_table(spark, sf_dir, "lineitem")
    year = l.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("date"))
    ).select("l_partkey", "l_suppkey", "l_quantity")
    from pyspark.sql import Window as W

    # single fact pass: the per-part total is a window SUM over the
    # (part, supplier) aggregate — not a second aggregation of `year`,
    # which would re-execute the filtered scan
    per_ps = year.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("l_quantity").alias("sq")
    )
    small = p.where(F.col("p_name").like("small%")).select("p_partkey")
    dominant = (
        per_ps.withColumn(
            "tq", F.sum("sq").over(W.partitionBy("l_partkey"))
        )
        .where(F.col("sq") > 0.3 * F.col("tq"))
        .join(F.broadcast(small), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .select("l_suppkey")
    )
    return (
        s.join(dominant, s.s_suppkey == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", "n_name")
    )


@query(
    "q58_blame_supplier",
    oracle="""
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier s
    JOIN (
        SELECT DISTINCT l1.l_suppkey, l1.l_orderkey
        FROM lineitem l1
        JOIN orders o ON o.o_orderkey = l1.l_orderkey
        WHERE o.o_orderstatus = 'F'
          AND l1.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
          AND EXISTS (
              SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (
              SELECT 1 FROM lineitem l3
              JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
              WHERE l3.l_orderkey = l1.l_orderkey
                AND l3.l_suppkey <> l1.l_suppkey
                AND l3.l_shipdate > o3.o_orderdate + INTERVAL 90 DAY)
    ) c ON c.l_suppkey = s.s_suppkey
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 100
    """,
)
def q58_blame_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21-class multi-correlation: suppliers who were the SOLE
    late shipper on a finished multi-supplier order (late = shipped more
    than 90 days after the order date; the synthetic schema has no
    commit/receipt dates).  The EXISTS / NOT EXISTS pair correlates the
    fact table with itself twice.

    Decorrelated Spark-first: ONE scan of lineitem⋈orders computes
    per-order supplier counts and late-supplier counts in a single
    aggregation; the blame condition becomes ``n_supp >= 2 AND
    n_late_supp = 1`` joined back to the late candidates — the fact
    table shuffles once on l_orderkey instead of three correlated
    rescans, and the supplier dim broadcasts."""
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    lo = (
        l.join(
            o.where(F.col("o_orderstatus") == "F").select("o_orderkey", "o_orderdate"),
            l.l_orderkey == F.col("o_orderkey"),
        )
        .select(
            "l_orderkey",
            "l_suppkey",
            (F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 90)).alias("late"),
        )
    )
    # ONE pass over the fact join: reduce to (order, supplier) grain with
    # a late flag, then derive the per-order stats as WINDOW aggregates
    # over that reduced frame — no self-join diamond, so the fact table
    # is scanned and shuffled exactly once; the window's repartition
    # moves only the (order, supplier) aggregate
    from pyspark.sql import Window as W

    pairs = lo.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(F.col("late").cast("int")).alias("was_late")
    )
    w = W.partitionBy("l_orderkey")
    blamed = (
        pairs.withColumn("n_supp", F.count("*").over(w))
        .withColumn("n_late_supp", F.sum("was_late").over(w))
        .where(
            (F.col("was_late") == 1)
            & (F.col("n_supp") >= 2)
            & (F.col("n_late_supp") == 1)
        )
        .select("l_orderkey", "l_suppkey")
    )
    return (
        blamed.join(F.broadcast(s), blamed.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


@query(
    "q62_top_supplier",
    oracle="""
    WITH rev AS (
        SELECT l_suppkey,
               CAST(ROUND(SUM(l_extendedprice * (1 - l_discount)) * 100) AS BIGINT)
                   AS total_revenue_c
        FROM lineitem
        WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue_c
    FROM supplier s JOIN rev r ON s.s_suppkey = r.l_suppkey
    WHERE r.total_revenue_c = (SELECT MAX(total_revenue_c) FROM rev)
    ORDER BY s.s_suppkey
    """,
)
def q62_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15-class: the supplier(s) achieving the quarter's maximum
    revenue — a scalar-subquery-against-aggregate-view shape.

    Decorrelated Spark-first: the revenue view aggregates once (single
    fact shuffle on l_suppkey); the scalar max reduces that small view
    and cross-joins back as a broadcast literal, so the comparison is a
    map-side filter, not a second correlated scan.  Revenue is compared
    in integer cents, making the max tie-exact across engines."""
    s = load_table(spark, sf_dir, "supplier")
    l = load_table(spark, sf_dir, "lineitem")
    # the explicit isnotnull matches the null-rejecting predicate the
    # supplier join pushes into its branch — without it the two rev
    # subtrees differ by that one filter and the Exchange can't be
    # reused (suppkey is the inner-join key, so the filter is vacuous)
    rev = (
        l.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("date"))
            & F.col("l_suppkey").isNotNull()
        )
        .groupBy("l_suppkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))) * 100
            )
            .cast("long")
            .alias("total_revenue_c")
        )
    )
    # scalar max via agg + broadcast join-back: both consumers of the
    # revenue view hang off the same hashpartitioning(l_suppkey)
    # Exchange, which Catalyst deduplicates (ReusedExchange) — the fact
    # scans and shuffles once, and no partition ever holds the whole
    # supplier-grain view (the old global-window form did exactly that)
    mx = rev.agg(F.max("total_revenue_c").alias("_mx"))
    top = (
        rev.join(F.broadcast(mx))
        .where(F.col("total_revenue_c") == F.col("_mx"))
        .drop("_mx")
    )
    return (
        s.join(F.broadcast(top), s.s_suppkey == F.col("l_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue_c")
        .orderBy("s_suppkey")
    )


@query(
    "q66_asof_join",
    oracle="""
    WITH c AS (
        SELECT event_id, user_id, epoch_ns(ts) // 1000 AS us
        FROM events WHERE event_type = 'click'
    ),
    p AS (
        SELECT user_id, epoch_ns(ts) // 1000 AS us
        FROM events WHERE event_type = 'purchase'
    )
    SELECT c.event_id, c.user_id,
           CAST(c.us - p.us AS BIGINT) AS wait_us
    FROM c ASOF JOIN p
      ON c.user_id = p.user_id AND c.us >= p.us
    """,
)
def q66_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: every click matched to the user's most recent prior
    (or simultaneous) purchase — DuckDB's native ASOF JOIN is the
    oracle.  The Spark side is the union-and-carry form (one shuffle on
    user_id, no pair explosion; see operators/temporal.py).  Time is
    compared as integer epoch-microseconds on both engines so ns-vs-us
    timestamp truncation can't flip a boundary match."""
    from magi_etl_spark.operators.temporal import asof_join

    e = load_table(spark, sf_dir, "events")
    base = e.select(
        "event_id", "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    clicks = base.where(F.col("event_type") == "click").drop("event_type")
    purchases = base.where(F.col("event_type") == "purchase").select(
        "user_id", "us"
    )
    m = asof_join(clicks, purchases, key="user_id", ts="us", right_cols=[])
    return m.select(
        "event_id", "user_id", (F.col("us") - F.col("asof_ts")).alias("wait_us")
    )


@query(
    "q67_range_join",
    oracle="""
    WITH c AS (
        SELECT event_id, user_id, epoch_ns(ts) // 1000 AS us
        FROM events WHERE event_type = 'click'
    ),
    s AS (
        SELECT event_id AS signup_event_id, user_id,
               epoch_ns(ts) // 1000 AS start_us,
               epoch_ns(ts) // 1000 + 86400000000 AS end_us
        FROM events WHERE event_type = 'signup'
    )
    SELECT c.event_id, c.user_id, s.signup_event_id,
           CAST(c.us - s.start_us AS BIGINT) AS offset_us
    FROM c JOIN s
      ON c.user_id = s.user_id
     AND c.us >= s.start_us AND c.us < s.end_us
    """,
)
def q67_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: clicks falling inside the 24h window after any signup
    of the same user.  Spark executes a raw interval predicate as a
    nested-loop join; the binned form (intervals replicated into the
    hour-buckets they overlap, hash join on (user, bucket), exact
    re-filter) keeps it a plain equi-join — here with 1-day bins, so
    each interval lands in at most 2 buckets."""
    from magi_etl_spark.operators.temporal import range_join

    e = load_table(spark, sf_dir, "events")
    base = e.select(
        "event_id", "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    clicks = base.where(F.col("event_type") == "click").drop("event_type")
    signups = base.where(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_event_id"),
        "user_id",
        F.col("us").alias("start_us"),
        (F.col("us") + F.lit(86_400_000_000)).alias("end_us"),
    )
    j = range_join(
        clicks, signups, key="user_id", ts="us",
        start="start_us", end="end_us", bin_seconds=86_400,
    )
    return j.select(
        "event_id", "user_id", "signup_event_id",
        (F.col("us") - F.col("start_us")).alias("offset_us"),
    )


@query(
    "q68_hypertable_rollup",
    oracle="""
    WITH e AS (
        SELECT event_type, epoch_ns(ts) // 1000 AS us,
               CAST(ROUND(value * 100) AS BIGINT) AS v_c
        FROM events
    ),
    lv AS (
        SELECT r.res AS resolution_sec,
               (e.us // (CAST(r.res AS BIGINT) * 1000000)) * (CAST(r.res AS BIGINT) * 1000000) AS bucket_us,
               e.event_type, e.v_c
        FROM e CROSS JOIN (VALUES (3600), (86400), (604800)) AS r(res)
    )
    SELECT CAST(resolution_sec AS INTEGER) AS resolution_sec,
           CAST(bucket_us AS BIGINT) AS bucket_us,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(v_c) AS BIGINT) AS value_c,
           CAST(MIN(v_c) AS BIGINT) AS min_v,
           CAST(MAX(v_c) AS BIGINT) AS max_v
    FROM lv GROUP BY 1, 2, 3
    """,
)
def q68_hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable rollup: hour/day/week aggregates of events per type in
    one cascaded pass — the facts aggregate once at hour resolution and
    each coarser level reaggregates the previous (already tiny) level,
    versus the oracle's one-scan-per-resolution form.  Mergeable
    aggregates only; integer cents for hash exactness."""
    from magi_etl_spark.operators.hypertable import hypertable_rollup
    from magi_etl_spark.operators.rollup_refresh import MetricCol

    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.unix_micros("ts").alias("us"),
        F.round(F.col("value") * 100).cast("long").alias("v_c"),
    )
    out = hypertable_rollup(
        e,
        "us",
        ["event_type"],
        [
            MetricCol("n", "count"),
            MetricCol("value_c", "sum"),
            MetricCol("min_v", "min"),
            MetricCol("max_v", "max"),
        ],
        {
            "n": F.lit(1),
            "value_c": F.col("v_c"),
            "min_v": F.col("v_c"),
            "max_v": F.col("v_c"),
        },
    )
    return out.select(
        F.col("resolution_sec").cast("int").alias("resolution_sec"),
        "bucket_us", "event_type", "n", "value_c", "min_v", "max_v",
    )


@query(
    "q71_small_order_parts",
    oracle="""
    SELECT CAST(ROUND(SUM(l.l_extendedprice) / 7.0 * 100) AS BIGINT)
               AS avg_yearly_c,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_size = 1
      AND l.l_quantity < (
          SELECT 0.2 * AVG(l2.l_quantity)
          FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
    """,
)
def q71_small_order_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-class: lines ordering less than 20% of a part's average
    quantity, for one part class — the scalar-correlated-AVG shape.

    Decorrelated Spark-first: the per-part AVG becomes a window AVG
    over lineitems restricted by a broadcast semi-join to the part
    filter (never the full table) — the restricted fact is scanned and
    shuffled exactly once."""
    p = load_table(spark, sf_dir, "part")
    l = load_table(spark, sf_dir, "lineitem")
    small = p.where(F.col("p_size") == 1).select("p_partkey")
    lines = l.join(
        F.broadcast(small), l.l_partkey == F.col("p_partkey"), "left_semi"
    ).select("l_partkey", "l_quantity", "l_extendedprice")
    from pyspark.sql import Window as W

    # single fact pass: the per-part average is a window AVG over the
    # restricted lines — the aggregate-and-join-back diamond would scan
    # the semi-joined fact twice
    probe = lines.withColumn(
        "cutoff", F.avg("l_quantity").over(W.partitionBy("l_partkey")) * 0.2
    ).where(F.col("l_quantity") < F.col("cutoff"))
    return probe.agg(
        F.round(F.sum("l_extendedprice") / 7.0 * 100).cast("long").alias(
            "avg_yearly_c"
        ),
        F.count("*").alias("n_lines"),
    )


@query(
    "q72_large_volume_customers",
    oracle="""
    WITH big AS (
        SELECT l_orderkey, SUM(l_quantity) AS total_qty
        FROM lineitem GROUP BY l_orderkey
        HAVING SUM(l_quantity) > 250
    )
    SELECT c.c_custkey, c.c_name, o.o_orderkey,
           CAST(o.o_orderdate AS VARCHAR) AS order_date,
           CAST(ROUND(b.total_qty * 100) AS BIGINT) AS total_qty_c
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN big b ON b.l_orderkey = o.o_orderkey
    """,
)
def q72_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-class: customers holding orders whose total line
    quantity exceeds a threshold — grouped-HAVING feeding an IN.

    Spark-first: one lineitem aggregation produces the (small) big-order
    set, which then BROADCASTS through orders and customer — the two
    dimension joins never shuffle, and the date is stringified so the
    ns-precision column can't leak into the hash."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .where(F.col("total_qty") > 250)
    )
    return (
        o.join(F.broadcast(big), o.o_orderkey == F.col("l_orderkey"))
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey", "c_name", "o_orderkey",
            F.col("o_orderdate").cast("string").alias("order_date"),
            F.round(F.col("total_qty") * 100).cast("long").alias("total_qty_c"),
        )
    )


@query(
    "q73_table_diff",
    oracle="""
    WITH a AS (
        SELECT event_id, user_id, event_type,
               CAST(ROUND(value * 100) AS BIGINT) AS v_c
        FROM events WHERE event_id % 11 <> 0
    ),
    b AS (
        SELECT event_id, user_id, event_type,
               CASE WHEN event_id % 13 = 0
                    THEN CAST(ROUND(value * 100) AS BIGINT) + 1
                    ELSE CAST(ROUND(value * 100) AS BIGINT) END AS v_c
        FROM events WHERE event_id % 7 <> 0
    )
    SELECT COALESCE(a.event_id, b.event_id) AS event_id,
           CASE WHEN b.event_id IS NULL THEN 'only_a'
                WHEN a.event_id IS NULL THEN 'only_b'
                ELSE 'mismatch' END AS status
    FROM a FULL OUTER JOIN b ON a.event_id = b.event_id
    WHERE b.event_id IS NULL OR a.event_id IS NULL
       OR a.user_id <> b.user_id OR a.event_type <> b.event_type
       OR a.v_c <> b.v_c
    """,
)
def q73_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-level reconciliation of two derived views of events (each
    missing a different id slice; one with perturbed values): only_a /
    only_b / mismatch per key.  The operator compares md5 row digests so
    the full-outer shuffle carries (key, 32-byte hash) instead of full
    rows; the oracle compares columns directly — agreement of the two
    proves the digest faithfully represents row equality."""
    from magi_etl_spark.operators.reconcile import table_diff

    e = load_table(spark, sf_dir, "events")
    base = e.select(
        "event_id", "user_id", "event_type",
        F.round(F.col("value") * 100).cast("long").alias("v_c"),
    )
    a = base.where(F.col("event_id") % 11 != 0)
    b = base.where(F.col("event_id") % 7 != 0).withColumn(
        "v_c",
        F.when(F.col("event_id") % 13 == 0, F.col("v_c") + 1).otherwise(
            F.col("v_c")
        ),
    )
    return table_diff(a, b, ["event_id"])


@query(
    "q74_daily_anomalies",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(epoch_ns(ts) // 1000000000 // 86400 AS BIGINT)
                   AS day_no,
               COUNT(*) AS n
        FROM events GROUP BY 1, 2
    ),
    scored AS (
        SELECT event_type, day_no, n,
               AVG(n) OVER w AS mu,
               STDDEV_SAMP(n) OVER w AS sigma,
               COUNT(*) OVER w AS n_window
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY day_no
                     ROWS BETWEEN 14 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type, day_no, CAST(n AS BIGINT) AS n,
           ROUND((n - mu) / sigma, 6) AS z
    FROM scored
    WHERE n_window >= 7 AND sigma > 0 AND ABS((n - mu) / sigma) > 2
    """,
)
def q74_daily_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume anomaly detection: days whose event count deviates more
    than 2 sigma from the trailing-14-day mean (excluding the current
    day), requiring at least 7 days of history — the monitoring rollup
    an analytics engine alerts from.  Day numbers are integer epoch-days
    so the window frame is engine-portable; one shuffle for the daily
    rollup, window runs per event_type."""
    from pyspark.sql import Window as W

    e = load_table(spark, sf_dir, "events")
    daily = (
        e.select(
            "event_type",
            (F.unix_micros("ts") / F.lit(86_400_000_000)).cast("long").alias(
                "day_no"
            ),
        )
        .groupBy("event_type", "day_no")
        .agg(F.count("*").alias("n"))
    )
    w = W.partitionBy("event_type").orderBy("day_no").rowsBetween(-14, -1)
    scored = daily.select(
        "event_type",
        "day_no",
        "n",
        F.avg("n").over(w).alias("mu"),
        F.stddev_samp("n").over(w).alias("sigma"),
        F.count("*").over(w).alias("n_window"),
    )
    z = (F.col("n") - F.col("mu")) / F.col("sigma")
    return (
        scored.where(
            (F.col("n_window") >= 7) & (F.col("sigma") > 0) & (F.abs(z) > 2)
        )
        .select("event_type", "day_no", "n", F.round(z, 6).alias("z"))
    )


@query(
    "q75_funnel",
    oracle="""
    WITH stages AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'signup'
                   THEN epoch_ns(ts) // 1000 END) AS s_us,
               MIN(CASE WHEN event_type = 'click'
                   THEN epoch_ns(ts) // 1000 END) AS c_us,
               MIN(CASE WHEN event_type = 'purchase'
                   THEN epoch_ns(ts) // 1000 END) AS p_us
        FROM events GROUP BY user_id
    ),
    reached AS (
        SELECT user_id,
               CASE WHEN s_us IS NULL THEN 0
                    WHEN c_us IS NULL OR c_us <= s_us THEN 1
                    WHEN p_us IS NULL OR p_us <= c_us THEN 2
                    ELSE 3 END AS stage
        FROM stages
    )
    SELECT stage, CAST(COUNT(*) AS BIGINT) AS users
    FROM reached GROUP BY stage
    """,
)
def q75_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: how far each user progresses through
    signup -> first later click -> first later purchase (stage 0-3),
    using first-occurrence timestamps — the conversion report of the
    reference's analytics domain.  ONE conditional-MIN aggregation per
    user computes all stages (single shuffle), then a tiny stage
    count; integer epoch-micros keep the ordering engine-exact."""
    e = load_table(spark, sf_dir, "events")

    def first_us(t):
        return F.min(
            F.when(F.col("event_type") == t, F.unix_micros("ts"))
        )

    stages = e.groupBy("user_id").agg(
        first_us("signup").alias("s_us"),
        first_us("click").alias("c_us"),
        first_us("purchase").alias("p_us"),
    )
    stage = (
        F.when(F.col("s_us").isNull(), 0)
        .when(F.col("c_us").isNull() | (F.col("c_us") <= F.col("s_us")), 1)
        .when(F.col("p_us").isNull() | (F.col("p_us") <= F.col("c_us")), 2)
        .otherwise(3)
    )
    return (
        stages.select(stage.alias("stage"))
        .groupBy("stage")
        .agg(F.count("*").alias("users"))
    )


@query(
    "q76_retention_cohorts",
    oracle="""
    WITH first_seen AS (
        SELECT user_id,
               MIN(epoch_ns(ts) // 1000000000 // 604800) AS cohort_week
        FROM events GROUP BY user_id
    ),
    activity AS (
        SELECT DISTINCT e.user_id,
               f.cohort_week,
               epoch_ns(e.ts) // 1000000000 // 604800 - f.cohort_week
                   AS week_offset
        FROM events e JOIN first_seen f ON e.user_id = f.user_id
    )
    SELECT CAST(cohort_week AS BIGINT) AS cohort_week,
           CAST(week_offset AS BIGINT) AS week_offset,
           CAST(COUNT(*) AS BIGINT) AS active_users
    FROM activity GROUP BY 1, 2
    """,
)
def q76_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention cohort matrix: users grouped by first-seen week, counted
    in every later week they were active — the engagement triangle.
    Weeks are integer epoch-weeks (floor(epoch_sec/604800)): calendar-
    free and engine-portable.  The first-seen aggregate (one row per
    user) shuffles once on user_id and then BROADCASTS into the events
    scan, so the fact side never shuffles for the self-join; the
    remaining exchanges operate on the already-tiny cohort frames."""
    e = load_table(spark, sf_dir, "events")
    week = (F.unix_micros("ts") / F.lit(604_800_000_000)).cast("long")
    weeks = e.select("user_id", week.alias("wk"))
    first = weeks.groupBy("user_id").agg(F.min("wk").alias("cohort_week"))
    activity = (
        weeks.join(first, "user_id")
        .select(
            "cohort_week", (F.col("wk") - F.col("cohort_week")).alias("week_offset"),
            "user_id",
        )
        .distinct()
    )
    return activity.groupBy("cohort_week", "week_offset").agg(
        F.count("*").alias("active_users")
    )


@query(
    "q78_key_skew_profile",
    oracle="""
    WITH counts AS (
        SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id
    ),
    stats AS (SELECT SUM(n) AS total, AVG(n) AS mean_n FROM counts),
    ranked AS (
        SELECT c.user_id, c.n,
               ROUND(c.n * 1.0 / s.total, 6) AS share,
               ROUND(c.n / s.mean_n, 6) AS x_mean,
               ROW_NUMBER() OVER (ORDER BY c.n DESC, c.user_id) AS rank
        FROM counts c, stats s
    )
    SELECT user_id, CAST(n AS BIGINT) AS n, share, x_mean,
           CAST(rank AS INTEGER) AS rank
    FROM ranked WHERE rank <= 20
    """,
)
def q78_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew profile of events.user_id: top-20 heavy hitters
    with table share and ratio-to-mean — the diagnostic that decides
    between a plain shuffle join, AQE skew split, and explicit
    salting (operators/skew.salted_join)."""
    from magi_etl_spark.operators.skew import key_skew_profile

    e = load_table(spark, sf_dir, "events")
    return key_skew_profile(e, ["user_id"], top_k=20)


# bucketed-table writes are idempotent per (session, sf_dir) — the
# correctness gate and the bench both call the query repeatedly in one
# session, and re-bucketing the fact table each call would time the
# write, not the join
_BUCKETED_READY: set[tuple[str, str]] = set()


@query(
    "q80_bucketed_colocated_join",
    oracle="""
    SELECT o.o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS price_c
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderstatus
    """,
)
def q80_bucketed_colocated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shuffle-free co-located join strategy on the bench tables:
    lineitem and orders are written once as hash-bucketed tables on the
    join key (``sinks.write_bucketed``, 32 buckets, sorted within
    buckets), then sort-merge joined — bucketing satisfies the join's
    distribution requirement on BOTH sides, so the plan carries no
    Exchange at all (asserted in tests/test_bucketing.py for this exact
    query).  The ``merge`` hint pins SMJ so the demonstration can't
    silently degrade to a broadcast join on small inputs.

    This is the 100 TB answer to the repeated lineitem⋈orders joins in
    the q03/q05 family: pay one bucketed write, then every subsequent
    join of tables bucketed on the same key with the same bucket count
    is shuffle-free and sort-free."""
    import hashlib
    import tempfile

    from magi_etl_spark.sinks import write_bucketed
    from magi_etl_spark.tables import load_table

    # suffix from the FULL path: a basename-only suffix would let two
    # sf_dirs named alike (e.g. /a/sf0.1 and /b/sf0.1) share catalog
    # table names while the memo below is keyed by full path — the
    # second dir would silently read the first dir's bucketed data
    suffix = hashlib.md5(sf_dir.rstrip("/").encode()).hexdigest()[:10]
    lt, ot = f"magi_b80_lineitem_{suffix}", f"magi_b80_orders_{suffix}"
    memo = (spark.sparkContext.applicationId, sf_dir.rstrip("/"))
    if memo not in _BUCKETED_READY:
        root = tempfile.mkdtemp(prefix="magi_q80_")
        l = load_table(spark, sf_dir, "lineitem").select(
            F.col("l_orderkey").alias("o_orderkey"), "l_extendedprice"
        )
        o = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderstatus"
        )
        write_bucketed(l, lt, "o_orderkey", 32, sort_col="o_orderkey",
                       path=f"{root}/{lt}")
        write_bucketed(o, ot, "o_orderkey", 32, sort_col="o_orderkey",
                       path=f"{root}/{ot}")
        _BUCKETED_READY.add(memo)
    bl, bo = spark.table(lt), spark.table(ot)
    return (
        bl.join(bo.hint("merge"), "o_orderkey")
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
            .cast("long")
            .alias("price_c"),
        )
    )


@query(
    "q83_event_gaps",
    oracle="""
    WITH g AS (
        SELECT user_id,
               epoch_us(ts) - lag(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS gap_us,
               lead(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) = event_type AS same_next
        FROM events
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(MAX(gap_us) AS BIGINT) AS max_gap_us,
           CAST(SUM(gap_us) AS BIGINT) AS total_gap_us,
           CAST(COUNT(CASE WHEN same_next THEN 1 END) AS BIGINT) AS n_repeats
    FROM g GROUP BY user_id
    """,
)
def q83_event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead analytic windows (the W-family member the rest of the
    inventory doesn't exercise): per-user inter-event gaps and
    same-type repeat transitions.  The window partitions on user_id —
    distributed by construction, no global ordering anywhere — with
    (ts, event_id) as a total order so ties can't flip the hash.
    Gaps stay integer epoch-micros end to end."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    g = e.select(
        "user_id",
        (us - F.lag(us).over(w)).alias("gap_us"),
        (F.lead("event_type").over(w) == F.col("event_type")).alias("same_next"),
    )
    return g.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.max("gap_us").alias("max_gap_us"),
        F.sum("gap_us").alias("total_gap_us"),
        F.count(F.when(F.col("same_next"), 1)).alias("n_repeats"),
    )


# z-ordered/linear layout copies are idempotent per (session, sf_dir),
# same reasoning as _BUCKETED_READY: the gate and bench re-invoke the
# query in one session and must time the pruned scan, not the re-layout
_Z85_READY: dict[tuple[str, str], str] = {}


@query(
    "q85_zorder_pruned_scan",
    oracle="""
    WITH b AS (SELECT MAX(user_id) // 10 AS lu, MAX(event_id) // 10 AS le
               FROM events)
    SELECT event_id, user_id, event_type, value
    FROM events, b
    WHERE user_id <= lu AND event_id <= le
    """,
)
def q85_zorder_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton-curve) layout proven at the gate: events is
    written once as a z-ordered copy on (user_id, event_id) and once in
    the conventional single-column layout (range-sorted by event_id),
    then a corner filter selective in BOTH dimensions scans the
    z-ordered copy.  Before returning, the query reads the parquet
    footers of both copies (``operators/zorder.file_stats_ranges``) and
    asserts the layout actually prunes: strictly fewer z-ordered files
    overlap the user_id predicate than linear files (the linear layout
    keeps the full user span in every file, so a user_id filter can
    never skip anything).  Correctness is the oracle: re-clustering only
    reorders rows, so the filtered result equals the same filter on the
    source table.  At 100 TB this is the layout for fact tables queried
    along several dimensions — the one range shuffle at write time buys
    stats-based file/row-group skipping on every participating column."""
    import tempfile

    from magi_etl_spark.operators.zorder import file_stats_ranges, write_zordered

    e = load_table(spark, sf_dir, "events")
    n_files = 8
    memo = (spark.sparkContext.applicationId, sf_dir.rstrip("/"))
    if memo not in _Z85_READY:
        root = tempfile.mkdtemp(prefix="magi_q85_")
        write_zordered(e, f"{root}/z", ["user_id", "event_id"], n_files=n_files)
        (
            e.repartitionByRange(n_files, "event_id")
            .sortWithinPartitions("event_id")
            .write.mode("overwrite")
            .parquet(f"{root}/linear")
        )
        _Z85_READY[memo] = root
    root = _Z85_READY[memo]
    mx = e.agg(F.max("user_id").alias("mu"), F.max("event_id").alias("me")).collect()[0]
    lu, le = mx["mu"] // 10, mx["me"] // 10
    z_stats = file_stats_ranges(f"{root}/z", ["user_id", "event_id"])
    l_stats = file_stats_ranges(f"{root}/linear", ["user_id"])
    z_user = sum(1 for mn, _ in z_stats["user_id"] if mn <= lu)
    l_user = sum(1 for mn, _ in l_stats["user_id"] if mn <= lu)
    z_both = sum(
        1
        for (umn, _), (emn, _) in zip(z_stats["user_id"], z_stats["event_id"])
        if umn <= lu and emn <= le
    )
    if not (z_user < l_user and z_both < n_files):
        raise AssertionError(
            f"z-order layout failed to prune: files overlapping user_id<={lu} "
            f"z={z_user} vs linear={l_user}; corner-filter overlap {z_both}/{n_files}"
        )
    zdf = spark.read.parquet(f"{root}/z")
    return zdf.where((F.col("user_id") <= lu) & (F.col("event_id") <= le)).select(
        "event_id", "user_id", "event_type", "value"
    )


@query(
    "q81_bloom_pruned_join",
    oracle="""
    SELECT o.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100)
                    AS BIGINT)) AS BIGINT) AS revenue_c
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_totalprice > 400000
    GROUP BY o.o_orderpriority
    """,
)
def q81_bloom_pruned_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join reduction via Catalyst's runtime Bloom filter: lineitem
    joined to the selective big-ticket orders slice (~20% of orders) as a
    shuffle join, with ``InjectRuntimeFilter`` planting the dim-side
    bloom under the fact scan so pruned fact rows never reach the
    exchange — the 100 TB shape when the dim side is selective but past
    the broadcast threshold (``operators/bloom.py``; plan-asserted in
    tests/test_bloom.py).  The bloom has no false negatives and the join
    re-checks exactly, so results equal the plain join's — which is what
    the oracle verifies."""
    from magi_etl_spark.operators.bloom import freeze_bloom_plan

    # all bloom/broadcast confs are scoped INSIDE the freeze — the
    # session keeps its defaults, so queries gated after this one don't
    # inherit the demonstration thresholds
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_totalprice") > 400000)
        .select("o_orderkey", "o_orderpriority")
    )

    def build() -> DataFrame:
        # the WHOLE query is composed and plan-frozen inside the scope:
        # a frame derived later would re-plan without the bloom
        return (
            l.join(o.hint("shuffle_merge"), l.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(
                F.count("*").alias("n_items"),
                F.sum(
                    F.round(
                        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                    ).cast("long")
                )
                .cast("long")
                .alias("revenue_c"),
            )
        )

    return freeze_bloom_plan(spark, build)
