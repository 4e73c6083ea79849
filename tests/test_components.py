"""Connected components / dedup clusters (operators/components.py)."""

from pyspark.sql import functions as F

from magi_etl_spark.operators.components import connected_components, dedup_clusters


def test_chain_and_separate_components(spark):
    # chain 1-2-3-4 (diameter 3, needs multiple propagation rounds),
    # pair 10-11, and an edge given in "backwards" order 21->20
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (21, 20)],
        "doc_a long, doc_b long",
    )
    got = {
        r.vertex: r.component for r in connected_components(edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def test_long_path_converges(spark):
    # path 0-1-2-...-15: min label must travel 15 hops
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(15)], "doc_a long, doc_b long"
    )
    got = connected_components(edges)
    assert {r.component for r in got.collect()} == {0}


def test_dedup_clusters_keep_flags(spark):
    docs = spark.range(8).select(F.col("id").alias("doc_id"))
    pairs = spark.createDataFrame(
        [(1, 5), (5, 7), (2, 3)], "doc_a long, doc_b long"
    )
    got = {r.doc_id: r for r in dedup_clusters(docs, pairs).collect()}
    assert got[5].representative == 1 and not got[5].keep
    assert got[7].representative == 1 and not got[7].keep
    assert got[3].representative == 2 and not got[3].keep
    # cluster reps and singletons survive
    kept = sorted(i for i, r in got.items() if r.keep)
    assert kept == [0, 1, 2, 4, 6]
