"""Recommendation engine tests: sparse cosine vs a DuckDB oracle over the
taxonomy fixtures, blended scoring, and the ML clustering surface."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from magi_etl_spark.operators.recommend import (
    cosine_similarity_pairs,
    scale_and_cluster,
    similar_content,
    taxonomy_features,
)
from tests.magi_fixtures import generate_all
from tests.oracle_harness import compare

FIELDS = {"site_all_genres": 1.0, "site_all_themes": 0.5}


@pytest.fixture(scope="module")
def magi(tmp_path_factory):
    return generate_all(str(tmp_path_factory.mktemp("magi_rec") / "tables"))


@pytest.fixture(scope="module")
def tax(spark, magi):
    # one row per wiki: taxonomy rows of article 0
    t = spark.read.parquet(magi["taxonomy"])
    return t.withColumn("id", F.col("content_ids").getItem("wiki_id")).where(
        F.col("content_ids").getItem("article_id") == "0"
    ).select("id", *FIELDS.keys())


def test_sparse_cosine_matches_oracle(tax, magi):
    feats = taxonomy_features(tax, "id", FIELDS)
    sims = cosine_similarity_pairs(feats, min_similarity=0.3).select(
        "id_a", "id_b", F.round("similarity", 6).alias("similarity")
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW taxonomy AS SELECT * FROM read_parquet('{magi['taxonomy']}')"
    )
    sql = """
    WITH rows_ AS (
        SELECT content_ids['wiki_id'][1] AS id, site_all_genres, site_all_themes
        FROM taxonomy WHERE content_ids['article_id'][1] = '0'
    ),
    triples AS (
        SELECT id, feature, 1.0 * max(conf) AS conf, 1.0 AS weight, 'g' AS fld FROM (
            SELECT id, 'site_all_genres:' || e.value AS feature, e.confidence AS conf
            FROM rows_, unnest(site_all_genres) AS t(e)
        ) GROUP BY 1, 2
        UNION ALL
        SELECT id, feature, 1.0 * max(conf), 0.5, 't' FROM (
            SELECT id, 'site_all_themes:' || e.value AS feature, e.confidence AS conf
            FROM rows_, unnest(site_all_themes) AS t(e)
        ) GROUP BY 1, 2
    ),
    normed AS (
        SELECT id, feature,
               weight * conf / sqrt(sum(conf * conf) OVER (PARTITION BY id, fld)) AS value
        FROM triples
    ),
    norms AS (
        SELECT id, sqrt(sum(value * value)) AS norm FROM normed GROUP BY id
    ),
    dots AS (
        SELECT a.id AS id_a, b.id AS id_b, sum(a.value * b.value) AS dot
        FROM normed a JOIN normed b ON a.feature = b.feature AND a.id <> b.id
        GROUP BY 1, 2
    )
    SELECT id_a, id_b, ROUND(dot / (na.norm * nb.norm), 6) AS similarity
    FROM dots
    JOIN norms na ON dots.id_a = na.id
    JOIN norms nb ON dots.id_b = nb.id
    WHERE dot / (na.norm * nb.norm) >= 0.3
    """
    ok, msg = compare(sims, con, sql)
    assert ok, msg


def test_similar_content_blend(spark):
    sims = spark.createDataFrame(
        [("a", "b", 0.9), ("a", "c", 0.8), ("a", "d", 0.99), ("b", "a", 0.9)],
        "id_a string, id_b string, similarity double",
    )
    traffic = spark.createDataFrame(
        [("a", 100), ("b", 50), ("c", 1000), ("d", 0)],
        "id string, users long",
    )
    out = similar_content(
        sims, traffic, spark.createDataFrame([("a",)], "id string"), n=2, alpha=0.7
    ).collect()
    by_rank = {r.rn: r for r in out}
    # d is dropped (users=0) despite best sim; c's popularity lifts it over b
    assert {r.id_a for r in out} == {"a"}
    assert by_rank[1].id_b == "c" and by_rank[2].id_b == "b"
    assert by_rank[1].combined_score == pytest.approx(0.7 * 0.8 + 0.3 * 1.0)


def test_scale_and_cluster_deterministic(spark):
    rows = [(f"w{i}", float(i % 3) * 100 + i, float(i % 3) * 50 + 2 * i) for i in range(30)]
    traffic = spark.createDataFrame(rows, "id string, users double, pageviews double")
    out1, sil1 = scale_and_cluster(traffic, ["users", "pageviews"], k=3, seed=42)
    out2, sil2 = scale_and_cluster(traffic, ["users", "pageviews"], k=3, seed=42)
    c1 = {r.id: r.cluster for r in out1.collect()}
    c2 = {r.id: r.cluster for r in out2.collect()}
    assert c1 == c2 and len(set(c1.values())) == 3
    assert sil1 == pytest.approx(sil2)
    assert -1.0 <= sil1 <= 1.0
