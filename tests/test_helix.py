"""Helix parity tests: the flat events⟗taxonomy relation and a metric
query over it, both against DuckDB oracles on the magi fixtures."""

from __future__ import annotations

import duckdb
import pytest

from magi_etl_spark.config import FilterGroup, MetricQueryConfig
from magi_etl_spark.pipelines.helix import HelixConfig, helix_dataset, helix_metric_dataset
from magi_etl_spark.query import metric_query
from tests.magi_fixtures import generate_all
from tests.oracle_harness import compare

CFG = HelixConfig(year="2025", month="02", confidence=0.6)

_ATTR_SRC = {
    "vertical": "site_all_verticals",
    "genre": "site_all_genres",
    "subgenre": "site_all_subgenres",
    "theme": "site_all_themes",
}


def _tax2_cols() -> str:
    cols = []
    for attr, src in _ATTR_SRC.items():
        f = f"list_filter({src}, x -> x.confidence >= 0.6)"
        vals = f"list_transform({f}, x -> lower(x.value))"
        cols.append(f"COALESCE({vals}, []) AS all_{attr}s")
        cols.append(f"COALESCE(list_transform({f}, x -> x.confidence), []) AS all_{attr}s_con")
        cols.append(f"CASE WHEN len({f}) > 0 THEN ({vals})[1] END AS main_{attr}")
    ff = (
        "list_filter(list_transform(site_all_franchises,"
        " f -> struct_pack(confidence := 1.0, value := f)), x -> x.confidence >= 0.6)"
    )
    ffv = f"list_transform({ff}, x -> lower(x.value))"
    cols.append(f"COALESCE({ffv}, []) AS all_franchises")
    cols.append(f"COALESCE(list_transform({ff}, x -> x.confidence), []) AS all_franchises_con")
    cols.append(f"CASE WHEN len({ff}) > 0 THEN ({ffv})[1] END AS main_franchise")
    return ",\n".join(cols)


HELIX_SQL = f"""
WITH tax2 AS (
    SELECT content_ids['article_id'][1] AS article_id,
           content_ids['wiki_id'][1] AS tax_wiki_id,
           {_tax2_cols()}
    FROM taxonomy
),
amp AS (
    SELECT year, month, wiki_id, content_id, page_url, pageviews, country,
           analytics_id AS amplitude_id,
           CAST(CAST(floor(wiki_id) AS BIGINT) AS VARCHAR) AS j_wiki,
           CAST(content_id AS VARCHAR) AS j_article
    FROM analytics_events
    WHERE brand = 'acme' AND platform = 'Web'
),
joined AS (
    SELECT * FROM amp
    FULL OUTER JOIN tax2
      ON amp.j_wiki = tax2.tax_wiki_id
     AND amp.j_article = CAST(tax2.article_id AS VARCHAR)
),
flat AS (
    SELECT j.year, j.month,
           {", ".join(f"all_{a}s, all_{a}s_con, main_{a}" for a in ["vertical", "genre", "subgenre", "theme", "franchise"])},
           j.pageviews, j.amplitude_id,
           j.content_id AS article_id,
           CAST(CAST(floor(j.wiki_id) AS BIGINT) AS VARCHAR) AS wiki_id,
           j.page_url,
           lower(split_part(split_part(j.page_url, '://', 2), '/', 1)) AS wiki,
           lower(d.vertical_name) AS vertical,
           (CAST(j.wiki_id AS VARCHAR) || '-' || j.content_id) AS wiki_article_id,
           lower(c.acme_country) AS country,
           lower(c.acme_sales_region) AS region,
           lower(c.sales_insights_subcontinent) AS subcontinent
    FROM joined j
    LEFT JOIN (SELECT CAST(CAST(floor(wiki_id) AS BIGINT) AS VARCHAR) AS d_wiki,
                      vertical_name FROM dimension_wikis) d
      ON j.j_wiki = d.d_wiki
    LEFT JOIN country_map c
      ON CAST(j.country AS VARCHAR) = CAST(c.amplitude_country AS VARCHAR)
    WHERE j.year = '2025' AND j.month = '02'
)
"""


@pytest.fixture(scope="module")
def magi(tmp_path_factory):
    return generate_all(str(tmp_path_factory.mktemp("magi_helix") / "tables"))


@pytest.fixture(scope="module")
def hcon(magi):
    con = duckdb.connect()
    for name, path in magi.items():
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    yield con
    con.close()


@pytest.fixture(scope="module")
def hdfs(spark, magi):
    return {name: spark.read.parquet(path) for name, path in magi.items()}


@pytest.fixture(scope="module")
def helix_df(hdfs):
    return helix_dataset(
        hdfs["analytics_events"], hdfs["taxonomy"], hdfs["dimension_wikis"],
        hdfs["country_map"], CFG,
    )


def test_helix_flat_relation(helix_df, hcon):
    ok, msg = compare(helix_df, hcon, HELIX_SQL + "SELECT * FROM flat")
    assert ok, msg


def test_helix_metric_query(hdfs, hcon):
    ds = helix_metric_dataset(
        hdfs["analytics_events"], hdfs["taxonomy"], hdfs["dimension_wikis"],
        hdfs["country_map"], CFG,
    )
    qcfg = MetricQueryConfig(
        dataset="helix",
        dimensions=["genre"],
        metrics=["users", "pageviews", "page_count"],
        filter_groups=[
            FilterGroup(attribute="vertical", values=["games", "tv"], logical_operator="or")
        ],
        min_metric="users",
        min_count=2,
    )
    out = metric_query(None, "", qcfg, dataset=ds)
    sql = HELIX_SQL + """
    , filtered AS (
        SELECT * FROM flat
        WHERE (lower(vertical) = lower('games') OR lower(vertical) = lower('tv'))
          AND len(all_genres) > 0
    ),
    ex AS (
        SELECT trim(g) AS genre, amplitude_id, pageviews, wiki_article_id
        FROM filtered, unnest(all_genres) AS t(g)
    )
    SELECT * FROM (
        SELECT genre,
               COUNT(DISTINCT amplitude_id) AS users,
               CAST(SUM(pageviews) AS BIGINT) AS pageviews,
               COUNT(DISTINCT wiki_article_id) AS page_count
        FROM ex GROUP BY genre
    ) WHERE users >= 2
    """
    ok, msg = compare(out, hcon, sql)
    assert ok, msg
