"""Persistent IVF index: save/load round-trip through ivf_topk,
incremental append searchability, and file-level partition pruning."""

from __future__ import annotations

from pyspark.sql import functions as F


def _build(spark, sf_dir, tmp_path):
    from magi_etl_spark.operators.ann_index import save_ivf_index
    from magi_etl_spark.operators.similarity import ivf_index_sampled
    from magi_etl_spark.tables import load_table

    em = load_table(spark, sf_dir, "embeddings")
    assigned, cents = ivf_index_sampled(em, n_lists=8, init="hash", seed=7)
    path = str(tmp_path / "ivf")
    save_ivf_index(assigned, cents, path)
    return em, path, cents


def test_roundtrip_preserves_ivf_topk_results(spark, sf_dir, tmp_path):
    from magi_etl_spark.operators.ann_index import load_ivf_index
    from magi_etl_spark.operators.similarity import ivf_index_sampled, ivf_topk
    from magi_etl_spark.tables import load_table

    em, path, _ = _build(spark, sf_dir, tmp_path)
    queries = em.where(F.col("vec_id") < 3)
    assigned, cents = ivf_index_sampled(em, n_lists=8, init="hash", seed=7)
    want = {
        (r["query_id"], r["vec_id"], r["rn"])
        for r in ivf_topk(assigned, cents, queries, k=5).collect()
    }
    l_assigned, l_cents = load_ivf_index(spark, path)
    got = {
        (r["query_id"], r["vec_id"], r["rn"])
        for r in ivf_topk(l_assigned, l_cents, queries, k=5).collect()
    }
    assert got == want


def test_append_makes_new_vectors_searchable(spark, sf_dir, tmp_path):
    from magi_etl_spark.operators.ann_index import (
        append_to_ivf_index,
        load_ivf_index,
    )
    from magi_etl_spark.operators.similarity import ivf_topk
    from magi_etl_spark.tables import load_table

    em, path, _ = _build(spark, sf_dir, tmp_path)
    # the increment duplicates vector 0 under a new id — it must come
    # back as that query's top neighbor
    inc = em.where(F.col("vec_id") == 0).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
    )
    n = append_to_ivf_index(inc, path)
    assert n == 1
    assigned, cents = load_ivf_index(spark, path)
    queries = em.where(F.col("vec_id") == 0)
    top = (
        ivf_topk(assigned, cents, queries, k=3)
        .where(F.col("rn") == 1)
        .first()
    )
    assert top["vec_id"] == 1_000_000 and top["score"] == 1.0


def test_probe_prunes_partitions_at_file_level(spark, sf_dir, tmp_path):
    from magi_etl_spark.operators.ann_index import (
        list_files_probed,
        probe_plan,
    )

    _, path, cents = _build(spark, sf_dir, tmp_path)
    all_files = set(list_files_probed(path, list(range(len(cents)))))
    probe = set(list_files_probed(path, [0, 1]))
    assert probe and probe < all_files  # strict subset: real pruning
    assert all("list_id=0" in f or "list_id=1" in f for f in probe)
    # Catalyst prunes the non-probed directories before opening a file
    plan = probe_plan(spark, path, [0, 1])
    scan = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "list_id" in scan.split("PartitionFilters", 1)[1]
