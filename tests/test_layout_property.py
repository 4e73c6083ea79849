"""Property-based checks for the physical-layout operators: the Bloom-
pruned join equals the plain join for ANY dim filter (no false negatives
survive the exact re-check), and the Morton key is order-preserving on
each axis when the other is fixed — the invariant that makes per-file
stats tight after range-partitioning on it."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def orders_lineitem(spark, sf_dir):
    from magi_etl_spark.tables import load_table

    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    return l, o


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(threshold=st.integers(min_value=0, max_value=600_000))
def test_bloom_join_equals_plain_join_any_selectivity(
    spark, orders_lineitem, threshold
):
    from magi_etl_spark.operators.bloom import bloom_pruned_join

    l, o = orders_lineitem
    dim = o.where(F.col("o_totalprice") > threshold)
    pruned = bloom_pruned_join(l, dim, l.l_orderkey == dim.o_orderkey)
    plain = l.join(dim, l.l_orderkey == dim.o_orderkey)
    assert pruned.count() == plain.count()


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    xs=st.lists(
        st.integers(min_value=-(10**6), max_value=10**6),
        min_size=3,
        max_size=30,
        unique=True,
    ),
    fixed=st.integers(min_value=-(10**6), max_value=10**6),
)
def test_zorder_key_monotonic_per_axis(spark, xs, fixed):
    from magi_etl_spark.operators.zorder import zorder_key

    rows = [(x, fixed) for x in xs] + [(fixed, x) for x in xs]
    df = spark.createDataFrame(rows, "a long, b long")
    base, z = zorder_key(df, ["a", "b"], bits=10)
    got = base.withColumn("_z", z).collect()
    # fixing one axis, the key must be non-decreasing in the other —
    # otherwise range partitioning on it couldn't produce tight per-file
    # min/max stats for that column
    for axis, other in (("a", "b"), ("b", "a")):
        line = sorted(
            (r[axis], r["_z"]) for r in got if r[other] == fixed
        )
        zs = [zv for _, zv in line]
        assert zs == sorted(zs), f"z-key not monotonic along {axis}"
