"""PageRank: agreement with a pure-Python power iteration (dangling
mass included), mass conservation, and structural sanity."""

from __future__ import annotations

import pytest


def _reference_pagerank(edges, damping=0.85, iterations=20):
    verts = sorted({v for e in edges for v in e})
    n = len(verts)
    idx = {v: i for i, v in enumerate(verts)}
    out = {v: 0 for v in verts}
    for s, _ in edges:
        out[s] += 1
    rank = [1.0 / n] * n
    for _ in range(iterations):
        contrib = [0.0] * n
        for s, d in edges:
            contrib[idx[d]] += rank[idx[s]] / out[s]
        dangling = sum(rank[idx[v]] for v in verts if out[v] == 0)
        rank = [
            (1 - damping) / n + damping * (c + dangling / n) for c in contrib
        ]
    return {v: rank[idx[v]] for v in verts}


EDGES = [
    (1, 2), (1, 3), (2, 3), (3, 1), (4, 3), (5, 3),
    (3, 6),  # 6 is dangling (no out-edges)
    (2, 3),  # parallel edge: counts twice
]


def test_pagerank_matches_reference_power_iteration(spark):
    from magi_etl_spark.operators.graph import pagerank

    df = spark.createDataFrame(EDGES, "src long, dst long")
    got = {r["vertex"]: r["rank"] for r in pagerank(df, iterations=20).collect()}
    want = _reference_pagerank(EDGES)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], rel=1e-9), v
    # mass conservation: the dangling redistribution keeps the sum at 1
    assert sum(got.values()) == pytest.approx(1.0, rel=1e-9)
    # the hub everyone links to dominates
    assert got[3] == max(got.values())


def test_pagerank_uniform_on_a_cycle(spark):
    from magi_etl_spark.operators.graph import pagerank

    cyc = [(i, (i + 1) % 5) for i in range(5)]
    df = spark.createDataFrame(cyc, "src long, dst long")
    got = [r["rank"] for r in pagerank(df, iterations=10).collect()]
    assert all(r == pytest.approx(0.2, rel=1e-9) for r in got)


def test_pagerank_validates_damping(spark):
    from magi_etl_spark.operators.graph import pagerank

    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError):
        pagerank(df, damping=1.0)
