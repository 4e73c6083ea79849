"""Pipeline-replication tests: each pipeline output is compared against a
hand-written DuckDB oracle implementing the reference SQL semantics over
the same magi-domain fixtures (anchor pinned 2025-02-28, thresholds scaled
to fixture size)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from magi_etl_spark.operators.upsert import upsert
from magi_etl_spark.pipelines.monetization import (
    apply_ignore_list,
    stale_metadata,
    unmonetized_wikis,
)
from magi_etl_spark.pipelines.trending import TrendingConfig, trending_pipeline
from magi_etl_spark.pipelines.wiki_metadata import (
    events_taxonomy_unity,
    page_breakdown,
    taxonomy_flatten,
    top_wiki_id_per_group,
    wiki_dim_enriched,
    wiki_id_traffic,
    wikis_complete,
)
from tests.magi_fixtures import ANCHOR, generate_all
from tests.oracle_harness import compare


@pytest.fixture(scope="module")
def magi(tmp_path_factory):
    out = tmp_path_factory.mktemp("magi") / "tables"
    return generate_all(str(out))


@pytest.fixture(scope="module")
def mcon(magi):
    con = duckdb.connect()
    for name, path in magi.items():
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    con.execute("""
        CREATE VIEW base AS
        SELECT *, CAST(concat(year,'-',month,'-',day) AS DATE) AS d,
               split_part(split_part(page_url,'://',2),'/',1) AS wiki_name
        FROM analytics_events
        WHERE lower(brand)='acme' AND lower(platform)='web'
    """)
    yield con
    con.close()


@pytest.fixture(scope="module")
def mdfs(spark, magi):
    return {name: spark.read.parquet(path) for name, path in magi.items()}


CFG = TrendingConfig(
    anchor_date=ANCHOR,
    min_users_total=10,
    min_users_percent=15,
    min_page_users=2,
)

# date literals matching AnchorCalendar(2025-02-28)
LATEST = "DATE '2025-02-27'"
COMP = "(DATE '2025-02-20', DATE '2025-02-13', DATE '2025-02-06', DATE '2025-01-30')"
WSTART, WEND = "DATE '2025-01-29'", "DATE '2025-02-27'"

TRENDING_CTES = f"""
WITH latest AS (
    SELECT wiki_name, count(distinct analytics_id) AS users,
           count(distinct concat(device_id,'-',session_id)) AS sessions,
           count(CASE WHEN event_type LIKE 'pageview' THEN 1 END) AS pageviews
    FROM base WHERE d = {LATEST} GROUP BY 1
),
comp AS (
    SELECT wiki_name, (1.0*count(distinct analytics_id))/4 AS users,
           (1.0*count(distinct concat(device_id,'-',session_id)))/4 AS sessions,
           (1.0*count(CASE WHEN event_type LIKE 'pageview' THEN 1 END))/4 AS pageviews
    FROM base WHERE d IN {COMP} GROUP BY 1
),
perid AS (
    SELECT wiki_name, e.wiki_id, w.vertical_name, sum(e.pageviews) AS pageviews
    FROM base e LEFT JOIN dimension_wikis w ON e.wiki_id = w.wiki_id
    WHERE d BETWEEN {WSTART} AND {WEND}
    GROUP BY 1, 2, 3
),
top_wiki AS (
    SELECT wiki_name, wiki_id, vertical_name FROM (
        SELECT *, row_number() OVER (
            PARTITION BY wiki_name
            ORDER BY pageviews DESC NULLS LAST, wiki_id ASC NULLS LAST,
                     vertical_name ASC NULLS LAST) AS rn
        FROM perid) WHERE rn = 1
),
summary AS (
    SELECT c.wiki_id, a.wiki_name, c.vertical_name, a.users,
           b.users AS users_benchmark,
           a.users - b.users AS users_total_vs_benchmark,
           (1.0*a.users/b.users)-1 AS users_percent_vs_benchmark,
           (1.0*a.pageviews/a.sessions) AS pvs_per_session,
           (1.0*b.pageviews/b.sessions) AS pvs_per_session_benchmark,
           (1.0*a.pageviews/a.sessions)-(1.0*b.pageviews/b.sessions)
               AS pvs_per_session_total_vs_benchmark,
           ((1.0*a.pageviews/a.sessions)/(1.0*b.pageviews/b.sessions))-1
               AS pvs_per_session_percent_vs_benchmark
    FROM latest a
    LEFT JOIN comp b USING (wiki_name)
    LEFT JOIN top_wiki c USING (wiki_name)
    WHERE a.wiki_name IS NOT NULL
      AND a.wiki_name NOT LIKE '%turbopages.org%'
      AND a.users >= {CFG.min_users_total}
),
top_total AS (
    SELECT wiki_name FROM summary
    ORDER BY users_total_vs_benchmark DESC NULLS LAST, wiki_name LIMIT {CFG.top_k}
),
top_percent AS (
    SELECT wiki_name FROM summary WHERE users >= {CFG.min_users_percent}
    ORDER BY users_percent_vs_benchmark DESC NULLS LAST, wiki_name LIMIT {CFG.top_k}
)
"""


def _page_sql(list_cte: str, metric: str) -> str:
    page = r"regexp_replace(regexp_replace(page_url, '\?.+$', ''), '#.+$', '')"
    return f"""
{TRENDING_CTES},
pl AS (
    SELECT wiki_name, {page} AS page,
           count(distinct analytics_id) AS users,
           count(distinct concat(device_id,'-',session_id)) AS sessions,
           count(CASE WHEN event_type LIKE 'pageview' THEN 1 END) AS pageviews
    FROM base WHERE d = {LATEST}
      AND wiki_name IN (SELECT wiki_name FROM {list_cte})
    GROUP BY 1, 2
),
pc AS (
    SELECT wiki_name, {page} AS page,
           (1.0*count(distinct analytics_id))/4 AS users,
           (1.0*count(distinct concat(device_id,'-',session_id)))/4 AS sessions,
           (1.0*count(CASE WHEN event_type LIKE 'pageview' THEN 1 END))/4 AS pageviews
    FROM base WHERE d IN {COMP}
      AND wiki_name IN (SELECT wiki_name FROM {list_cte})
    GROUP BY 1, 2
),
ranked AS (
    SELECT *, rank() OVER (PARTITION BY wiki_name ORDER BY {metric} DESC NULLS LAST) AS rnk
    FROM (
        SELECT a.wiki_name, a.page, a.users, a.sessions, a.pageviews,
               b.users AS users_benchmark,
               a.users - b.users AS users_total_vs_benchmark,
               (1.0*a.users/b.users)-1 AS users_percent_vs_benchmark,
               (1.0*a.pageviews/a.sessions) AS pvs_per_session,
               (1.0*b.pageviews/b.sessions) AS pvs_per_session_benchmark,
               (1.0*a.pageviews/a.sessions)-(1.0*b.pageviews/b.sessions)
                   AS pvs_per_session_total_vs_benchmark,
               ((1.0*a.pageviews/a.sessions)/(1.0*b.pageviews/b.sessions))-1
                   AS pvs_per_session_percent_vs_benchmark
        FROM pl a LEFT JOIN pc b ON a.wiki_name = b.wiki_name AND a.page = b.page
        WHERE a.users >= {CFG.min_page_users}
    )
)
SELECT * FROM ranked
WHERE wiki_name IS NOT NULL AND page IS NOT NULL AND rnk <= {CFG.page_top_k}
"""


@pytest.fixture(scope="module")
def trending(mdfs):
    return trending_pipeline(mdfs["analytics_events"], mdfs["dimension_wikis"], CFG)


def test_trending_wiki_summary(trending, mcon):
    ok, msg = compare(trending["wiki_summary"], mcon, TRENDING_CTES + "\nSELECT * FROM summary")
    assert ok, msg


def test_trending_page_total(trending, mcon):
    ok, msg = compare(trending["page_total"], mcon, _page_sql("top_total", "users_total_vs_benchmark"))
    assert ok, msg


def test_trending_page_percent(trending, mcon):
    ok, msg = compare(
        trending["page_percent"], mcon, _page_sql("top_percent", "users_percent_vs_benchmark")
    )
    assert ok, msg


def test_trending_wiki_daily(trending, mcon):
    sql = f"""
{TRENDING_CTES},
session_details AS (
    SELECT concat(device_id,'-',session_id) AS device_session_id, wiki_name,
           greatest(date_diff('second',
                min(try_cast(event_time AS TIMESTAMP)),
                max(try_cast(event_time AS TIMESTAMP))), 0) AS session_duration_seconds,
           count(*) AS hit_depth,
           min(event_time) AS min_ts
    FROM base
    WHERE d BETWEEN {WSTART} AND {WEND}
      AND date_trunc('day', try_cast(event_time AS TIMESTAMP)) BETWEEN {WSTART} AND {WEND}
      AND session_id <> '-1'
    GROUP BY 1, 2
),
daily_base AS (
    SELECT concat(year,'-',month,'-',day) AS date, wiki_name, analytics_id,
           concat(device_id,'-',session_id) AS device_session_id, event_type, event_time
    FROM base
    WHERE d BETWEEN {WSTART} AND {WEND}
      AND wiki_name IN (SELECT wiki_name FROM top_total
                        UNION SELECT wiki_name FROM top_percent)
)
SELECT date, a.wiki_name AS wiki_name,
       count(distinct analytics_id) AS users,
       count(distinct a.device_session_id) AS sessions,
       sum(CASE WHEN event_type = 'pageview' THEN 1 END) AS pageviews,
       sum(session_duration_seconds) AS session_duration_seconds,
       sum(CASE WHEN hit_depth = 1 THEN 1 END) AS bounces
FROM daily_base a
LEFT JOIN session_details b
  ON a.device_session_id = b.device_session_id AND a.event_time = b.min_ts
GROUP BY 1, 2
HAVING a.wiki_name IS NOT NULL
"""
    ok, msg = compare(trending["wiki_daily"], mcon, sql)
    assert ok, msg


def test_monetization(mdfs, mcon):
    out = unmonetized_wikis(
        mdfs["analytics_events"], mdfs["dimension_wikis"], ANCHOR, threshold=200
    )
    filtered = apply_ignore_list(out, mdfs["ignore_list"])
    sql = f"""
    WITH unmon AS (
        SELECT e.wiki_id, w.is_monetized,
               count(distinct analytics_id) AS users,
               count(distinct session_id) AS sessions,
               CAST(sum(e.pageviews) AS BIGINT) AS pageviews
        FROM base e LEFT JOIN dimension_wikis w ON e.wiki_id = w.wiki_id
        WHERE d BETWEEN {WSTART} AND {WEND} AND NOT (w.is_monetized = 1)
        GROUP BY 1, 2
        HAVING sum(e.pageviews) >= 200
    )
    SELECT * FROM unmon
    WHERE CAST(CAST(wiki_id AS BIGINT) AS VARCHAR) NOT IN (SELECT wiki_id FROM ignore_list)
    """
    assert out.count() > filtered.count()  # ignore list actually removed rows
    ok, msg = compare(filtered, mcon, sql)
    assert ok, msg


def test_stale_metadata(mdfs, magi):
    import pandas as pd

    out = {r["wiki_id"] for r in stale_metadata(mdfs["wiki_metadata"], ANCHOR).collect()}
    pdf = pd.read_parquet(magi["wiki_metadata"])
    cutoff = pd.Timestamp(ANCHOR) - pd.Timedelta(days=6)
    expected = set(
        pdf[
            pdf.ai_summary.isna()
            | (pd.to_datetime(pdf.last_refreshed).dt.normalize() < cutoff)
        ].wiki_id
    )
    assert out == expected and out  # non-empty and exact


def test_wiki_id_traffic(mdfs, mcon):
    wl = mdfs["dimension_wikis"].where(F.col("site") == "acme")
    out = wiki_id_traffic(mdfs["analytics_events"], ANCHOR, wiki_list=wl)
    sql = f"""
    SELECT wiki_id, count(distinct analytics_id) AS users,
           count(distinct session_id) AS sessions, CAST(sum(pageviews) AS BIGINT) AS pageviews
    FROM base
    WHERE d BETWEEN {WSTART} AND {WEND} AND wiki_id > 0 AND wiki_id IS NOT NULL
      AND CAST(wiki_id AS VARCHAR) IN
          (SELECT CAST(wiki_id AS VARCHAR) FROM dimension_wikis WHERE site='acme')
    GROUP BY 1
    """
    ok, msg = compare(out, mcon, sql)
    assert ok, msg


def test_wikis_complete_and_dim(mdfs, mcon):
    traffic = wiki_id_traffic(mdfs["analytics_events"], ANCHOR)
    meta = wiki_dim_enriched(mdfs["dimension_wikis"], mdfs["dimension_users"])
    out = wikis_complete(traffic, meta)
    sql = f"""
    WITH traffic AS (
        SELECT wiki_id, count(distinct analytics_id) AS users,
               count(distinct session_id) AS sessions, CAST(sum(pageviews) AS BIGINT) AS pageviews
        FROM base
        WHERE d BETWEEN {WSTART} AND {WEND} AND wiki_id > 0 AND wiki_id IS NOT NULL
        GROUP BY 1
    ),
    meta AS (
        SELECT a.wiki_id, split_part(domain,'/',1) AS wiki_group, domain, created_at,
               is_kid_wiki, is_monetized, vertical_name, lang, founding_user_id,
               b.user_name AS founding_user_name
        FROM dimension_wikis a LEFT JOIN dimension_users b ON a.founding_user_id = b.user_id
        WHERE site = 'acme'
    )
    SELECT t.wiki_id, m.wiki_group, m.domain, m.created_at, m.is_kid_wiki, m.is_monetized,
           m.vertical_name, m.lang, m.founding_user_id, m.founding_user_name,
           t.users AS users_30_days, t.sessions AS sessions_30_days,
           t.pageviews AS pageviews_30_days
    FROM traffic t LEFT JOIN meta m ON t.wiki_id = m.wiki_id
    """
    ok, msg = compare(out, mcon, sql)
    assert ok, msg


def test_page_breakdown_with_cap(mdfs, mcon):
    out = page_breakdown(mdfs["analytics_events"], ANCHOR, per_wiki_cap=5)
    page = r"regexp_replace(regexp_replace(page_url, '\?.+$', ''), '#+$', '')"
    sql = f"""
    WITH pb AS (
        SELECT wiki_id, {page} AS page,
               count(distinct analytics_id) AS users_30_days,
               count(distinct session_id) AS sessions_30_days,
               CAST(sum(pageviews) AS BIGINT) AS pageviews_30_days
        FROM base
        WHERE d BETWEEN {WSTART} AND {WEND} AND wiki_id > 0 AND wiki_id IS NOT NULL
          AND page_url NOT LIKE '%turbopages.org%'
        GROUP BY 1, 2
    )
    SELECT wiki_id, page, users_30_days, sessions_30_days, pageviews_30_days FROM (
        SELECT *, row_number() OVER (
            PARTITION BY wiki_id ORDER BY pageviews_30_days DESC NULLS LAST, page ASC) AS rn
        FROM pb) WHERE rn <= 5
    """
    ok, msg = compare(out, mcon, sql)
    assert ok, msg


def test_top_wiki_id_per_group(mdfs, mcon):
    out = top_wiki_id_per_group(mdfs["analytics_events"], ANCHOR)
    sql = f"""
    WITH agg AS (
        SELECT wiki_name AS wiki_group, wiki_id, CAST(sum(pageviews) AS BIGINT) AS pageviews
        FROM base WHERE d BETWEEN {WSTART} AND {WEND}
        GROUP BY 1, 2
    )
    SELECT wiki_group, wiki_id, pageviews FROM (
        SELECT *, row_number() OVER (
            PARTITION BY wiki_group
            ORDER BY pageviews DESC NULLS LAST, wiki_id ASC NULLS LAST) AS rn
        FROM agg) WHERE rn = 1
    """
    ok, msg = compare(out, mcon, sql)
    assert ok, msg


def test_taxonomy_flatten(mdfs, mcon):
    out = taxonomy_flatten(mdfs["taxonomy"])
    sql = """
    SELECT content_ids['article_id'][1] AS article_id,
           content_ids['wiki_id'][1] AS wiki_id,
           url,
           list_transform(site_all_verticals, x -> x.value)[1] AS main_vertical,
           coalesce(array_to_string(list_transform(site_all_verticals, x -> x.value), ','), '') AS all_verticals,
           site_all_franchises AS main_franchise,
           coalesce(array_to_string(list_transform(page_main_entity_type, x -> x.value), ','), '') AS main_entity_type,
           coalesce(array_to_string(list_transform(page_all_installment_ids, x -> x.value), ','), '') AS all_installment_ids,
           coalesce(array_to_string(list_transform(page_all_installment_types, x -> x.value), ','), '') AS all_installment_types,
           coalesce(array_to_string(list_transform(page_all_installment_titles, x -> x.value), ','), '') AS all_installment_titles,
           coalesce(array_to_string(list_transform(site_all_genres, x -> CAST(x.confidence AS VARCHAR)), ','), '') AS all_genres_con,
           coalesce(array_to_string(list_transform(site_all_genres, x -> x.value), ','), '') AS all_genres,
           coalesce(array_to_string(list_transform(site_all_subgenres, x -> CAST(x.confidence AS VARCHAR)), ','), '') AS all_subgenres_con,
           coalesce(array_to_string(list_transform(site_all_subgenres, x -> x.value), ','), '') AS all_subgenres,
           coalesce(array_to_string(list_transform(page_all_platforms, x -> x.value), ','), '') AS all_platforms,
           coalesce(array_to_string(list_transform(site_all_themes, x -> CAST(x.confidence AS VARCHAR)), ','), '') AS all_themes_con,
           coalesce(array_to_string(list_transform(site_all_themes, x -> x.value), ','), '') AS all_themes
    FROM taxonomy
    """
    ok, msg = compare(out, mcon, sql)
    assert ok, msg


def test_events_taxonomy_unity(mdfs, mcon):
    flat = taxonomy_flatten(mdfs["taxonomy"])
    out = events_taxonomy_unity(mdfs["analytics_events"], flat, ANCHOR)
    sql = f"""
    WITH tax AS (
        SELECT content_ids['wiki_id'][1] AS tax_wiki_id,
               content_ids['article_id'][1] AS article_id,
               coalesce(array_to_string(list_transform(site_all_themes, x -> x.value), ','), '') AS all_themes,
               coalesce(array_to_string(list_transform(site_all_themes, x -> CAST(x.confidence AS VARCHAR)), ','), '') AS all_themes_con,
               coalesce(array_to_string(list_transform(site_all_genres, x -> x.value), ','), '') AS all_genres,
               coalesce(array_to_string(list_transform(site_all_genres, x -> CAST(x.confidence AS VARCHAR)), ','), '') AS all_genres_con,
               coalesce(array_to_string(list_transform(site_all_subgenres, x -> x.value), ','), '') AS all_subgenres,
               coalesce(array_to_string(list_transform(site_all_subgenres, x -> CAST(x.confidence AS VARCHAR)), ','), '') AS all_subgenres_con
        FROM taxonomy
    ),
    amp AS (
        SELECT * FROM analytics_events
        WHERE lower(brand) = 'acme' AND lower(platform) = 'web'
    ),
    unity AS (
        SELECT t1.wiki_id, t1.analytics_id, t1.pageviews,
               (CAST(t1.wiki_id AS VARCHAR) || '-' || t1.content_id) AS wiki_article_id,
               t2.all_themes, t2.all_themes_con, t2.all_genres, t2.all_genres_con,
               t2.all_subgenres, t2.all_subgenres_con,
               t1.year, t1.month, t1.day
        FROM amp t1
        FULL OUTER JOIN tax t2
          ON CAST(CAST(floor(t1.wiki_id) AS BIGINT) AS VARCHAR) = t2.tax_wiki_id
         AND CAST(t1.content_id AS VARCHAR) = t2.article_id
    )
    SELECT wiki_id, analytics_id, pageviews, wiki_article_id,
           all_themes, all_themes_con, all_genres, all_genres_con,
           all_subgenres, all_subgenres_con
    FROM unity
    WHERE CAST((year || '-' || month || '-' || day) AS DATE) BETWEEN {WSTART} AND {WEND}
    """
    ok, msg = compare(out, mcon, sql)
    assert ok, msg


def test_upsert(spark):
    old = spark.createDataFrame(
        [("a", 1, "old"), ("b", 2, "old"), ("c", 3, "old")], "k string, v int, src string"
    )
    new = spark.createDataFrame(
        [("b", 20, "new"), ("d", 40, "new")], "k string, v int, src string"
    )
    out = {(r.k, r.v, r.src) for r in upsert(new, old, ["k"]).collect()}
    assert out == {("a", 1, "old"), ("c", 3, "old"), ("b", 20, "new"), ("d", 40, "new")}
