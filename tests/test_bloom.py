"""Runtime Bloom-filter join pruning: the physical plan carries the
dim-side bloom probe under the fact scan, and results equal the plain
join exactly (no false negatives + exact re-check)."""

from __future__ import annotations

from pyspark.sql import functions as F

from magi_etl_spark.operators.bloom import bloom_pruned_join
from magi_etl_spark.tables import load_table


def test_bloom_probe_in_plan_and_exact_results(spark, sf_dir):
    conf_keys = (
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
    )
    before = {k: spark.conf.get(k) for k in conf_keys}
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    o = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_totalprice") > 400000)
        .select("o_orderkey", "o_orderpriority")
    )
    pruned = bloom_pruned_join(l, o, l.l_orderkey == o.o_orderkey)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "might_contain" in plan, "runtime bloom filter was not injected"
    assert "bloom_filter_agg" in plan

    plain = l.join(o, l.l_orderkey == o.o_orderkey)
    key = lambda r: (r.l_orderkey, r.l_extendedprice, r.o_orderpriority)  # noqa: E731
    assert sorted(map(key, pruned.collect())) == sorted(map(key, plain.collect()))

    # the conf scope is fully restored: later queries in this session
    # plan under the SAME confs as before the freeze
    after = {k: spark.conf.get(k) for k in before}
    assert after == before


def test_q81_registered_with_oracle(spark, sf_dir):
    from magi_etl_spark.queries import ORACLE, QUERIES

    assert "q81_bloom_pruned_join" in QUERIES
    assert "q81_bloom_pruned_join" in ORACLE
    df = QUERIES["q81_bloom_pruned_join"](spark, sf_dir)
    # the COMPOSED query (join + agg) must carry the bloom, not just the
    # raw operator — deriving frames from a frozen plan re-plans without it
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "might_contain" in plan
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"o_orderpriority", "n_items", "revenue_c"}
