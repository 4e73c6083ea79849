"""Round-12 ADVICE regression tests (the 8-for-8 habit).

r11 ADVICE items + verdict nits, each pinned here:
1. (low) spatial.py 9-cell probe offsets ``_cx ± 1`` left BIGINT when
   eps=1 and a coordinate sits at LONG_MIN/LONG_MAX (cell id equals the
   coordinate there) — raises ARITHMETIC_OVERFLOW under ANSI Spark.
   Probe cells now ride decimal(20,0) on both join sides.
2. (low) fdr.py crashed with ValueError when
   ``spark.sql.shuffle.partitions`` holds a non-integer sentinel (e.g.
   "auto" under AQE-managed shuffles); the derived default now degrades
   to 200.  Sibling sweep: ``functions._scan_width`` parsed
   ``spark.sql.files.maxPartitionBytes`` with ``int(str(v).rstrip("b"))``
   which crashes on size-suffixed values like "128m" — now a real
   size parser with a fallback.
3. (verdict nit) acf.py force-broadcast its per-series totals frame;
   series cardinality is caller-controlled, so the hint is gone and AQE
   chooses the join strategy.
4. (verdict nit) auc.py docstring promised decimal(38,0) cross-products
   but cast operands to decimal(19,0), relying on implicit promotion;
   the cast now matches the documented idiom.
"""

from __future__ import annotations

from pyspark.sql import functions as F

LONG_MIN = -(2**63)
LONG_MAX = 2**63 - 1


# --- 1: spatial probe cells survive eps=1 at the int64 extremes --------------


def test_grid_join_eps1_at_int64_extremes(spark):
    from magi_etl_spark.operators.spatial import grid_blocked_eps_join

    pts = [
        (1, LONG_MAX, 0),
        (2, LONG_MAX - 1, 0),
        (3, LONG_MIN, 0),
        (4, LONG_MIN + 1, 0),
    ]
    df = spark.createDataFrame(pts, "id long, x long, y long")
    got = {
        (r.id_l, r.id_r, r.dist2)
        for r in grid_blocked_eps_join(
            df.select(F.col("id").alias("id_l"), "x", "y"),
            df.select(F.col("id").alias("id_r"), "x", "y"),
            1,
            ["id_l"],
            ["id_r"],
        ).collect()
    }
    want = {
        (1, 1, 0), (2, 2, 0), (3, 3, 0), (4, 4, 0),
        (1, 2, 1), (2, 1, 1), (3, 4, 1), (4, 3, 1),
    }
    assert got == want


def test_nearest_in_radius_eps1_at_int64_extremes(spark):
    from magi_etl_spark.operators.spatial import nearest_in_radius

    left = spark.createDataFrame(
        [(1, LONG_MAX, LONG_MAX)], "id_l long, x long, y long"
    )
    right = spark.createDataFrame(
        [(10, LONG_MAX, LONG_MAX - 1), (11, LONG_MAX - 1, LONG_MAX)],
        "id_r long, x long, y long",
    )
    rows = nearest_in_radius(left, right, 1, ["id_l"], ["id_r"]).collect()
    assert len(rows) == 1
    # dist2 ties at 1; the struct-min tiebreak picks the smaller id_r
    assert (rows[0].id_l, rows[0].id_r, rows[0].dist2) == (1, 10, 1)


# --- 2: non-integer conf values degrade instead of crashing ------------------


def test_bh_survives_non_integer_shuffle_conf(spark, monkeypatch):
    from magi_etl_spark.operators.fdr import bh_summary

    conf_cls = type(spark.conf)
    real_get = conf_cls.get
    missing = object()  # preserve RuntimeConfig's no-default sentinel

    def fake_get(self, key, default=missing):
        if key == "spark.sql.shuffle.partitions":
            return "auto"
        if default is missing:
            return real_get(self, key)
        return real_get(self, key, default)

    monkeypatch.setattr(conf_cls, "get", fake_get)
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate([1000, 8000, 30000, 900000])],
        "id long, p_micro long",
    )
    row = bh_summary(df, "p_micro", ["id"], 1, 20).collect()[0]
    # BH at alpha=0.05, m=4: thresholds 12500/25000/37500/50000 micro —
    # k*=3 (p=30000 <= 37500), reject the three smallest
    assert (row.m, row.k_star, row.p_star_micro, row.n_rejected) == (
        4, 3, 30000, 3,
    )


def test_size_bytes_parses_spark_suffixes():
    from magi_etl_spark.functions import _size_bytes

    assert _size_bytes("134217728", 0) == 134217728
    assert _size_bytes("134217728b", 0) == 134217728
    assert _size_bytes("128m", 0) == 128 << 20
    assert _size_bytes("64MB", 0) == 64 << 20
    assert _size_bytes("1g", 0) == 1 << 30
    assert _size_bytes(" 2 kb ", 0) == 2048
    assert _size_bytes("auto", 7) == 7
    assert _size_bytes("12q", 7) == 7
    assert _size_bytes(None, 7) == 7


# --- 3: acf no longer forces a broadcast of the totals side ------------------


def test_acf_drops_null_order_rows(spark):
    from magi_etl_spark.operators.acf import autocorrelation

    # a null-ordered observation must not enter the lead chains: Spark
    # sorts it NULLS FIRST (other engines LAST), which would silently
    # shift every pairing — drop it like a null value
    with_null = spark.createDataFrame(
        [("s", 0, 1), ("s", None, 999), ("s", 1, 2), ("s", 2, 3)],
        "series string, t long, x long",
    )
    without = spark.createDataFrame(
        [("s", 0, 1), ("s", 1, 2), ("s", 2, 3)],
        "series string, t long, x long",
    )
    got = sorted(
        (r.k, r.n, r.r_k)
        for r in autocorrelation(
            with_null, ["series"], "t", F.col("x"), 2
        ).collect()
    )
    want = sorted(
        (r.k, r.n, r.r_k)
        for r in autocorrelation(
            without, ["series"], "t", F.col("x"), 2
        ).collect()
    )
    assert got == want and got[0][1] == 3


def test_acf_has_no_forced_broadcast_hint(spark):
    from magi_etl_spark.operators.acf import autocorrelation

    df = spark.createDataFrame(
        [("s", t, v) for t, v in enumerate([3, 1, 4, 1, 5, 9, 2, 6])],
        "series string, t long, x long",
    )
    out = autocorrelation(df, ["series"], "t", F.col("x"), max_lag=2)
    plan = out._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in plan and "UnresolvedHint" not in plan
    # semantics unchanged: lag-k autocorrelation still computed
    got = {r.k: r.r_k for r in out.collect()}
    assert set(got) == {1, 2}


# --- 4: auc cross-products cast operands to decimal(38,0) as documented ------


def test_auc_casts_operands_to_decimal38(spark):
    from magi_etl_spark.operators.auc import group_auc

    df = spark.createDataFrame(
        [("g", s, l) for s, l in [(1, 0), (2, 0), (3, 1), (4, 1)]],
        "g string, s long, label long",
    )
    out = group_auc(df, ["g"], F.col("s"), F.col("label"))
    plan = out._jdf.queryExecution().analyzed().toString()
    assert "decimal(38,0)" in plan and "decimal(19,0)" not in plan
    row = out.collect()[0]
    # perfect separation: u2 = 2 * n_pos * n_neg = 8, auc = 1
    assert (row.n_pos, row.n_neg, row.u2, float(row.auc)) == (2, 2, 8, 1.0)
