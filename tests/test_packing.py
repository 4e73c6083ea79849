"""Sequence packing (operators/packing.py)."""

import pytest
from pyspark.sql import functions as F

from magi_etl_spark.operators.packing import pack_chunks, packing_efficiency


@pytest.fixture()
def chunks(spark):
    # one bucket (single doc_id) with a known greedy trace:
    # budget 100: [60, 30 | 50, 40 | 120 | 90, 10]
    rows = [
        (1, 0, 60), (1, 1, 30), (1, 2, 50), (1, 3, 40),
        (1, 4, 120),  # oversize: bin of its own, not dropped
        (1, 5, 90), (1, 6, 10),
    ]
    return spark.createDataFrame(rows, "doc_id long, chunk_idx int, n_chunk_tokens int")


def test_next_fit_trace(chunks):
    packed = {
        r.chunk_idx: (r.seq_id, r.seq_pos)
        for r in pack_chunks(chunks, budget=100, n_buckets=4).collect()
    }
    assert packed == {
        0: (0, 0), 1: (0, 1),
        2: (1, 0), 3: (1, 1),
        4: (2, 0),
        5: (3, 0), 6: (3, 1),
    }


def test_budget_respected_and_nothing_lost(spark):
    chunks = spark.range(500).select(
        (F.col("id") % 37).alias("doc_id"),
        (F.col("id") / 37).cast("int").alias("chunk_idx"),
        (F.col("id") % 90 + 10).cast("int").alias("n_chunk_tokens"),
    )
    packed = pack_chunks(chunks, budget=128, n_buckets=8)
    assert packed.count() == 500  # packing never drops chunks
    fills = packed.groupBy("bucket", "seq_id").agg(
        F.sum("n_chunk_tokens").alias("fill"), F.count("*").alias("n")
    )
    # every multi-chunk sequence fits the budget (only oversize singletons may exceed)
    assert fills.where((F.col("fill") > 128) & (F.col("n") > 1)).count() == 0
    # deterministic under repartitioning
    a = sorted(map(tuple, packed.collect()))
    b = sorted(map(tuple, pack_chunks(chunks.repartition(13), budget=128, n_buckets=8).collect()))
    assert a == b


def test_packing_efficiency(chunks):
    packed = pack_chunks(chunks, budget=100, n_buckets=4)
    eff = packing_efficiency(packed, budget=100).collect()
    assert len(eff) == 1  # single doc -> single bucket
    row = eff[0]
    assert row.n_sequences == 4
    # fills: 90, 90, 120, 100 -> padding 10+10-20+0
    assert row.padding_tokens == (100 - 90) + (100 - 90) + (100 - 120) + 0
    assert row.mean_fill == pytest.approx((0.9 + 0.9 + 1.2 + 1.0) / 4)


def test_packing_invariants_property(spark):
    """Property-based: for random chunk sets, packing (a) preserves every
    chunk exactly once, (b) never exceeds the budget in multi-chunk
    bins, (c) numbers seq_pos contiguously from 0 within each bin."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(
        max_examples=8, deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        sizes=st.lists(st.integers(min_value=1, max_value=200), min_size=1,
                       max_size=60),
        budget=st.integers(min_value=50, max_value=300),
    )
    def check(sizes, budget):
        rows = [(i % 7, i, n) for i, n in enumerate(sizes)]
        chunks = spark.createDataFrame(
            rows, "doc_id long, chunk_idx int, n_chunk_tokens int"
        )
        packed = pack_chunks(chunks, budget=budget, n_buckets=4).collect()
        assert sorted((r.doc_id, r.chunk_idx) for r in packed) == sorted(
            (d, c) for d, c, _ in rows
        )
        bins = {}
        for r in packed:
            bins.setdefault((r.bucket, r.seq_id), []).append(r)
        for rows_in_bin in bins.values():
            total = sum(r.n_chunk_tokens for r in rows_in_bin)
            if len(rows_in_bin) > 1:
                assert total <= budget
            assert sorted(r.seq_pos for r in rows_in_bin) == list(
                range(len(rows_in_bin))
            )

    check()
