"""STAGED r8 gate queries over the round-7 operator additions.

Same staging pattern the r4->r5, r5->r6 and r6->r7 rotations proved
out: the r7 driver window is full and pre-committed (COVERAGE.md
"Planned r7 window"), and the gate-window invariant test refuses
never-verified queries outside it — so new operators land here, in a
SEPARATE registry (``EXT4_QUERIES`` / ``EXT4_ORACLE``) that
``__spark_entry__.queries()`` does NOT include yet, with the driver's
own hash comparison run over every entry each suite run
(tests/test_extensions_r7.py).  At the r8 rotation these merge into the
main registry verbatim, behind q183 (which leads the r8 queue).

Round-7 operator wave (all NEW modules — the linkage.py isolation rule
keeps every gate-verified surface byte-identical): engagement analytics
(rolling DAU/WAU/MAU stickiness, exponential time-decay scoring,
sweep-line peak concurrency — ``operators/engagement.py``), inequality
audits (Gini / Lorenz — ``operators/inequality.py``), tabular feature
prep (leakage-free K-fold target encoding, WOE/IV, largest-remainder
quota sampling — ``operators/mlprep.py``), and the further families
this round stages (changepoint detection, winnowing fingerprints,
prefix-filter set-similarity joins, script profiling, SCD2 event-time
enrichment, k-core decomposition, storage pruning).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from magi_etl_spark.tables import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]

EXT4_QUERIES: dict[str, QueryFn] = {}
EXT4_ORACLE: dict[str, str] = {}


def ext4_query(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        EXT4_QUERIES[name] = fn
        if oracle is not None:
            EXT4_ORACLE[name] = oracle
        return fn

    return deco


# --- engagement analytics ----------------------------------------------------


@ext4_query(
    "q184_active_user_stickiness",
    oracle="""
    WITH ud AS (
        SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ),
    days AS (SELECT DISTINCT day FROM ud)
    SELECT d.day AS day,
           CAST(COUNT(DISTINCT CASE WHEN u.day = d.day
                                    THEN u.user_id END) AS BIGINT) AS dau,
           CAST(COUNT(DISTINCT CASE WHEN u.day > d.day - 7
                                    THEN u.user_id END) AS BIGINT) AS wau,
           CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS mau,
           ROUND(CAST(COUNT(DISTINCT CASE WHEN u.day = d.day
                                          THEN u.user_id END) AS DOUBLE)
                 / COUNT(DISTINCT u.user_id), 4) AS stickiness
    FROM days d JOIN ud u ON u.day BETWEEN d.day - 29 AND d.day
    GROUP BY d.day
    """,
)
def q184_active_user_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling DAU/WAU/MAU + stickiness per activity day.  The Spark
    side never self-joins the event stream: it collapses to distinct
    (user, day) pairs and explodes each across the 30 days it can count
    toward — a bounded fan-out of the SMALL frame, one conditional
    count_distinct aggregation (the oracle states the same semantics as
    a range join over the collapsed pairs)."""
    from magi_etl_spark.operators.engagement import rolling_active_users

    return rolling_active_users(load_table(spark, sf_dir, "events"))


@ext4_query(
    "q185_concurrency_peaks",
    oracle="""
    WITH s AS (
        SELECT user_id, CAST(ts AS DATE) AS day,
               MIN(ts) AS start_ts,
               MAX(ts) + INTERVAL 1 SECOND AS end_ts
        FROM events GROUP BY user_id, CAST(ts AS DATE)
    ),
    d AS (
        SELECT start_ts AS ts, 1 AS delta, user_id, day FROM s
        UNION ALL
        SELECT end_ts AS ts, -1 AS delta, user_id, day FROM s
    ),
    c AS (
        SELECT ts, delta,
               SUM(delta) OVER (ORDER BY ts, delta, user_id, day
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND CURRENT ROW) AS cum
        FROM d
    )
    SELECT date_trunc('hour', ts) AS hour,
           CAST(MAX(cum) AS BIGINT) AS peak_concurrency,
           CAST(SUM(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS session_starts
    FROM c GROUP BY date_trunc('hour', ts)
    """,
)
def q185_concurrency_peaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sweep-line peak concurrency per hour over end-exclusive
    (user, day) session intervals.  The oracle's global running sum is
    a single ORDER BY over everything; the Spark side computes the
    identical cumulative through the two-pass range-partitioned prefix
    sum (operators/prefix.py) — no single-partition window."""
    from magi_etl_spark.operators.engagement import concurrency_profile

    return concurrency_profile(load_table(spark, sf_dir, "events"))


@ext4_query(
    "q187_decay_engagement",
    oracle="""
    WITH ref AS (SELECT MAX(CAST(ts AS DATE)) AS ref_day FROM events)
    SELECT user_id,
           ROUND(SUM(ROUND(value, 2)
                     * POWER(0.97, date_diff('day', CAST(ts AS DATE),
                                             ref.ref_day))), 4)
               AS decay_score,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events, ref
    GROUP BY user_id
    """,
)
def q187_decay_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponential time-decay engagement score anchored at the
    newest activity day (broadcast 1-row aggregate — the anchor rides
    the plan).  Per-event terms are deterministic scalar expressions;
    the sum is rounded to 4 dp."""
    from magi_etl_spark.operators.engagement import decay_engagement_scores

    return decay_engagement_scores(load_table(spark, sf_dir, "events"))


# --- inequality audits -------------------------------------------------------


@ext4_query(
    "q186_revenue_gini",
    oracle="""
    WITH pe AS (
        SELECT c.c_mktsegment AS segment, o.o_custkey AS cust,
               CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS m
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY 1, 2
    ),
    r AS (
        SELECT segment, m,
               ROW_NUMBER() OVER (PARTITION BY segment
                                  ORDER BY m, cust) AS rk
        FROM pe
    )
    SELECT segment,
           CAST(COUNT(*) AS BIGINT) AS n_entities,
           CAST(SUM(m) AS BIGINT) AS total_mass,
           ROUND(2.0 * SUM(rk * m)
                     / (COUNT(*) * CAST(SUM(m) AS DOUBLE))
                 - (COUNT(*) + 1) / CAST(COUNT(*) AS DOUBLE), 6) AS gini
    FROM r GROUP BY segment
    """,
)
def q186_revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer revenue within each market segment
    — integer cent masses, unique (mass, custkey) rank tie-break, one
    rounded division per segment."""
    from magi_etl_spark.operators.inequality import gini_by_group

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    j = orders.join(
        F.broadcast(cust.select("c_custkey", "c_mktsegment")),
        orders.o_custkey == cust.c_custkey,
    )
    return gini_by_group(
        j.select(
            F.col("c_mktsegment").alias("segment"),
            "o_custkey",
            F.round(F.col("o_totalprice") * 100)
            .cast("long")
            .alias("_cents"),
        ),
        ["segment"],
        "o_custkey",
        F.col("_cents"),
    )


# --- tabular feature prep ----------------------------------------------------


@ext4_query(
    "q188_target_encoding",
    oracle="""
    WITH base AS (
        SELECT o_orderpriority AS category,
               CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y,
               CAST(CAST(concat('0x', substr(md5(concat('fold|',
                        CAST(o_orderkey AS VARCHAR))), 1, 8)) AS BIGINT)
                    % 5 AS INT) AS fold
        FROM orders
    ),
    cf AS (
        SELECT category, fold, CAST(COUNT(*) AS BIGINT) AS cnt_f,
               CAST(SUM(y) AS BIGINT) AS sum_f
        FROM base GROUP BY 1, 2
    ),
    c AS (
        SELECT category, CAST(SUM(cnt_f) AS BIGINT) AS cnt_c,
               CAST(SUM(sum_f) AS BIGINT) AS sum_c
        FROM cf GROUP BY 1
    ),
    g AS (
        SELECT CAST(SUM(cnt_f) AS BIGINT) AS cnt_g,
               CAST(SUM(sum_f) AS BIGINT) AS sum_g
        FROM cf
    )
    SELECT cf.category, cf.fold, cf.cnt_f AS n_in,
           c.cnt_c - cf.cnt_f AS n_out,
           ROUND((CAST(c.sum_c - cf.sum_f AS DOUBLE)
                  + 20.0 * (CAST(g.sum_g AS DOUBLE) / g.cnt_g))
                 / CAST(c.cnt_c - cf.cnt_f + 20 AS DOUBLE), 6) AS encoded
    FROM cf JOIN c USING (category), g
    """,
)
def q188_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-free 5-fold target encoding of order priority against
    the is-fulfilled label: each (category, fold) cell's encoding uses
    only the OTHER folds' rows, smoothed toward the global rate with a
    prior weight of 20.  Folds are md5 arithmetic both engines replay
    digit for digit."""
    from magi_etl_spark.operators.mlprep import target_encode_kfold

    orders = load_table(spark, sf_dir, "orders")
    return target_encode_kfold(
        orders,
        "o_orderpriority",
        (F.col("o_orderstatus") == "F").cast("int"),
        F.col("o_orderkey"),
        n_folds=5,
        prior_weight=20,
    )


@ext4_query(
    "q189_woe_iv",
    oracle="""
    WITH base AS (
        SELECT CAST(FLOOR(o_totalprice / 25000.0) AS BIGINT) AS bin,
               CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
        FROM orders
    ),
    pb AS (
        SELECT bin, CAST(SUM(y) AS BIGINT) AS n_pos,
               CAST(SUM(1 - y) AS BIGINT) AS n_neg
        FROM base GROUP BY bin
    ),
    t AS (
        SELECT CAST(SUM(n_pos) AS BIGINT) AS pt,
               CAST(SUM(n_neg) AS BIGINT) AS nt,
               CAST(COUNT(*) AS BIGINT) AS nb
        FROM pb
    ),
    terms AS (
        SELECT pb.bin, pb.n_pos, pb.n_neg,
               LN((CAST(pb.n_pos + 1 AS DOUBLE) / (t.pt + t.nb))
                  / (CAST(pb.n_neg + 1 AS DOUBLE) / (t.nt + t.nb))) AS w,
               (CAST(pb.n_pos + 1 AS DOUBLE) / (t.pt + t.nb)
                - CAST(pb.n_neg + 1 AS DOUBLE) / (t.nt + t.nb))
               * LN((CAST(pb.n_pos + 1 AS DOUBLE) / (t.pt + t.nb))
                    / (CAST(pb.n_neg + 1 AS DOUBLE) / (t.nt + t.nb)))
                   AS ivt
        FROM pb, t
    )
    SELECT bin, n_pos, n_neg, ROUND(w, 4) AS woe,
           ROUND(ivt, 4) AS iv_term,
           (SELECT ROUND(SUM(ivt), 4) FROM terms) AS iv
    FROM terms
    """,
)
def q189_woe_iv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-evidence / information-value diagnostic of the
    order-value bin (25k-wide) against the is-fulfilled label, with
    Laplace-smoothed shares so empty cells never divide by zero.
    Counts are integers; the log and both rounded emissions share one
    expression tree on each side."""
    from magi_etl_spark.operators.mlprep import woe_iv

    orders = load_table(spark, sf_dir, "orders")
    return woe_iv(
        orders,
        F.floor(F.col("o_totalprice") / 25000.0).cast("long"),
        (F.col("o_orderstatus") == "F").cast("int"),
    )


@ext4_query(
    "q190_quota_sample",
    oracle="""
    WITH counts AS (
        SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM documents GROUP BY lang, source
    ),
    tot AS (
        SELECT CAST(SUM(n_rows) AS BIGINT) AS N FROM counts
    ),
    q AS (
        SELECT lang, source, n_rows,
               (n_rows * 500) // tot.N AS fl,
               (n_rows * 500) % tot.N AS rem
        FROM counts, tot
    ),
    short AS (SELECT 500 - CAST(SUM(fl) AS BIGINT) AS s FROM q),
    quota AS (
        SELECT lang, source,
               fl + CASE WHEN ROW_NUMBER() OVER (ORDER BY rem DESC,
                                                 lang ASC, source ASC)
                              <= short.s
                         THEN 1 ELSE 0 END AS quota
        FROM q, short
    ),
    ranked AS (
        SELECT d.doc_id, d.lang, d.source,
               ROW_NUMBER() OVER (
                   PARTITION BY d.lang, d.source
                   ORDER BY md5(concat('quota|',
                                       CAST(d.doc_id AS VARCHAR))),
                            d.doc_id) AS rn
        FROM documents d
    )
    SELECT r.doc_id, r.lang, r.source
    FROM ranked r JOIN quota USING (lang, source)
    WHERE r.rn <= quota.quota
    """,
)
def q190_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-500-row stratified sample of documents by (lang, source)
    under largest-remainder (Hamilton) apportionment — all-integer
    quota arithmetic, md5-ordered deterministic draws within each
    stratum."""
    from magi_etl_spark.operators.mlprep import quota_sample

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source"
    )
    return quota_sample(docs, ["lang", "source"], "doc_id", 500)
