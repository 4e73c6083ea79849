"""SemDeDup-style semantic dedup: one representative per near-duplicate
embedding family, chains collapsed, isolated vectors untouched."""

from __future__ import annotations


def _vec(base: list[float], eps: float) -> list[float]:
    # same direction with a tiny per-element wobble: cosine stays ~1
    return [x * (1.0 + eps) for x in base]


def test_semantic_dedup_keeps_one_per_family(spark):
    from magi_etl_spark.operators.similarity import semantic_dedup

    fam_a = [1.0, 0.0, 0.0, 0.0]
    fam_b = [0.0, 1.0, 0.0, 0.0]
    lone = [0.5, 0.5, 0.5, 0.5]
    rows = [
        (1, _vec(fam_a, 0.0)),
        (2, _vec(fam_a, 0.001)),
        (3, _vec(fam_a, -0.002)),  # chain with 1 and 2
        (10, _vec(fam_b, 0.0)),
        (11, _vec(fam_b, 0.003)),
        (50, lone),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semantic_dedup(df, threshold=0.99, n_lists=2, seed=3).collect()
    by_id = {r["vec_id"]: r for r in out}
    assert len(by_id) == 6  # every input row is accounted for
    # family A collapses to min id 1; family B to 10; the loner keeps itself
    assert {r["vec_id"] for r in out if r["kept"]} == {1, 10, 50}
    assert by_id[2]["rep_id"] == 1 and by_id[3]["rep_id"] == 1
    assert by_id[11]["rep_id"] == 10
    assert by_id[50]["rep_id"] == 50 and by_id[50]["kept"]


def test_semantic_dedup_threshold_separates_families(spark):
    from magi_etl_spark.operators.similarity import semantic_dedup
    import math

    # two directions 25 degrees apart: cosine ~0.906 — dups at 0.85,
    # distinct at 0.95
    a = [1.0, 0.0]
    b = [math.cos(math.radians(25)), math.sin(math.radians(25))]
    df = spark.createDataFrame(
        [(1, a), (2, b)], "vec_id long, embedding array<double>"
    )
    strict = semantic_dedup(df, threshold=0.95, n_lists=1, seed=1)
    loose = semantic_dedup(df, threshold=0.85, n_lists=1, seed=1)
    assert {r["vec_id"] for r in strict.collect() if r["kept"]} == {1, 2}
    assert {r["vec_id"] for r in loose.collect() if r["kept"]} == {1}


def test_semantic_dedup_on_real_embeddings(spark, sf_dir):
    from magi_etl_spark.operators.similarity import semantic_dedup
    from magi_etl_spark.tables import load_table

    em = load_table(spark, sf_dir, "embeddings")
    n = em.count()
    out = semantic_dedup(em, threshold=0.999, n_lists=4, seed=7)
    rows = out.collect()
    assert len(rows) == n  # one output row per vector, no loss
    kept = sum(1 for r in rows if r["kept"])
    assert 0 < kept <= n
    # representative invariants: reps keep themselves, drops point at a
    # kept id no larger than their own
    reps = {r["vec_id"] for r in rows if r["kept"]}
    for r in rows:
        assert r["rep_id"] in reps
        assert r["rep_id"] <= r["vec_id"]
