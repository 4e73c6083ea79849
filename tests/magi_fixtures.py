"""Deterministic magi-domain fixture tables (FIXTURES.md group 2).

Seeded (42) generators producing the source relations the reference
pipelines read: the float-polluted daily event log with string partition
columns, the semi-structured taxonomy, dimensions, country map, ignore
list, and pre-existing metadata state.  Anchor date pinned to 2025-02-28
so calendar logic is reproducible.
"""

from __future__ import annotations

import datetime as dt
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

ANCHOR = dt.date(2025, 2, 28)
LATEST = ANCHOR - dt.timedelta(days=1)
START = LATEST - dt.timedelta(days=29)
FIRST_DAY = dt.date(2025, 1, 20)

WIKI_IDS = list(range(100, 130))
SPIKE_WIKIS = {101, 105, 113}
GENRES = [f"genre_{i}" for i in range(12)]
THEMES = [f"theme_{i}" for i in range(20)]
VERTICALS = ["Games", "TV", "Movies", "Anime", "Books", "Comics", "Music", "Lifestyle", "Other"]
FRANCHISES = [f"franchise_{i}" for i in range(30)]
COUNTRIES = ["United States", "Germany", "Japan", "Brazil", "France"]


def _domain(i: int) -> str:
    return f"w{i}.acme.com"


def gen_events(rng: np.random.RandomState) -> pd.DataFrame:
    rows = []
    days = [FIRST_DAY + dt.timedelta(days=k) for k in range((LATEST - FIRST_DAY).days + 1)]
    for day in days:
        for rank, wid in enumerate(WIKI_IDS):
            base = max(3, int(90 / (rank + 1)))
            if day == LATEST and wid in SPIKE_WIKIS:
                base *= 4
            n = rng.poisson(base)
            if n == 0:
                continue
            users = rng.randint(0, max(2, base), size=n)
            for u in users:
                uid = wid * 1000 + int(u)
                page_k = int(rng.zipf(1.6)) % 40
                url = f"https://{_domain(wid)}/wiki/Page_{page_k}"
                r = rng.rand()
                if r < 0.10:
                    url += "?q=x=1"
                elif r < 0.15:
                    url += "#section-2"
                if rng.rand() < 0.01:
                    url = f"https://turbopages.org/mirror/Page_{page_k}"
                sess = "-1" if rng.rand() < 0.02 else f"s{uid}_{rng.randint(0, 3)}"
                hh, mm, ss = rng.randint(0, 24), rng.randint(0, 60), rng.randint(0, 60)
                et = f"{day.isoformat()}T{hh:02d}:{mm:02d}:{ss:02d}"
                if rng.rand() < 0.003:
                    et = "not-a-timestamp"
                brand = rng.choice(["acme", "acme", "acme", "Acme", "other"], p=[0.7, 0.15, 0.08, 0.05, 0.02])
                platform = rng.choice(["Web", "web", "iOS", "Android"], p=[0.6, 0.15, 0.15, 0.1])
                wiki_val: float | None = float(wid)
                rr = rng.rand()
                if rr < 0.01:
                    wiki_val = None
                elif rr < 0.02:
                    wiki_val = 0.0
                rows.append(
                    (
                        day.strftime("%Y"),
                        day.strftime("%m"),
                        day.strftime("%d"),
                        brand,
                        platform,
                        wiki_val,
                        str(page_k),
                        url,
                        uid,
                        f"d{uid}",
                        sess,
                        rng.choice(["pageview", "click", "scroll"], p=[0.7, 0.2, 0.1]),
                        et,
                        int(rng.choice([0, 1, 1, 1, 2])),
                        rng.choice(COUNTRIES),
                    )
                )
    return pd.DataFrame(
        rows,
        columns=[
            "year", "month", "day", "brand", "platform", "wiki_id", "content_id",
            "page_url", "analytics_id", "device_id", "session_id", "event_type",
            "event_time", "pageviews", "country",
        ],
    )


def _conf_arr(rng: np.random.RandomState, vocab: list[str], lo: int = 0, hi: int = 5):
    n = rng.randint(lo, hi)
    return [
        {"confidence": round(float(rng.rand()), 2), "value": str(rng.choice(vocab))}
        for _ in range(n)
    ]


def gen_taxonomy(rng: np.random.RandomState) -> pa.Table:
    conf_t = pa.list_(pa.struct([("confidence", pa.float64()), ("value", pa.string())]))
    cols: dict[str, list] = {k: [] for k in [
        "content_ids", "url",
        "site_all_verticals", "site_all_genres", "site_all_subgenres", "site_all_themes",
        "site_all_franchises",
        "page_all_verticals", "page_all_genres", "page_all_subgenres", "page_all_themes",
        "page_main_entity_type", "page_all_installment_ids", "page_all_installment_types",
        "page_all_installment_titles", "page_all_platforms",
    ]}
    for wid in WIKI_IDS + [990]:  # 990: taxonomy-only wiki (full-outer nulls)
        for k in range(0, 40, 2):
            cols["content_ids"].append([("article_id", str(k)), ("wiki_id", str(wid))])
            cols["url"].append(f"https://{_domain(wid)}/wiki/Page_{k}")
            cols["site_all_verticals"].append(_conf_arr(rng, VERTICALS, 1, 3))
            cols["site_all_genres"].append(_conf_arr(rng, GENRES, 0, 5))
            cols["site_all_subgenres"].append(_conf_arr(rng, GENRES, 0, 4))
            cols["site_all_themes"].append(_conf_arr(rng, THEMES, 0, 6))
            cols["site_all_franchises"].append(
                [str(f) for f in rng.choice(FRANCHISES, size=rng.randint(0, 3), replace=False)]
            )
            for p in ["page_all_verticals", "page_all_genres", "page_all_subgenres",
                      "page_all_themes", "page_main_entity_type", "page_all_installment_ids",
                      "page_all_installment_types", "page_all_installment_titles",
                      "page_all_platforms"]:
                cols[p].append(_conf_arr(rng, THEMES, 0, 3))
    schema = pa.schema(
        [("content_ids", pa.map_(pa.string(), pa.string())), ("url", pa.string())]
        + [(c, conf_t) for c in cols if c.startswith(("site_", "page_")) and c != "site_all_franchises"]
        + [("site_all_franchises", pa.list_(pa.string()))]
    )
    arrays = [pa.array(cols[f.name], type=f.type) for f in schema]
    return pa.Table.from_arrays(arrays, schema=schema)


def gen_dimension_wikis(rng: np.random.RandomState) -> pd.DataFrame:
    rows = []
    for wid in WIKI_IDS + [95, 96, 97]:  # orphans with no events
        dom = _domain(wid) + ("/es" if wid % 7 == 0 else "")
        rows.append(
            (
                wid, dom, f"https://{dom}", rng.choice(VERTICALS),
                rng.choice(["en", "es", "de", "ja"]), int(rng.rand() < 0.1),
                int(rng.rand() < 0.7),
                f"20{rng.randint(10, 24):02d}-0{rng.randint(1, 9)}-15T00:00:00",
                int(rng.randint(1, 20)),
                "acme" if wid % 13 else "other",
            )
        )
    return pd.DataFrame(
        rows,
        columns=["wiki_id", "domain", "url", "vertical_name", "lang", "is_kid_wiki",
                 "is_monetized", "created_at", "founding_user_id", "site"],
    )


def gen_dimension_users() -> pd.DataFrame:
    return pd.DataFrame({"user_id": list(range(1, 21)), "user_name": [f"user_{i}" for i in range(1, 21)]})


def gen_country_map() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "amplitude_country": COUNTRIES,
            "acme_country": ["US", "DE", "JP", "BR", "FR"],
            "acme_sales_region": ["NA", "EMEA", "APAC", "LATAM", "EMEA"],
            "sales_insights_subcontinent": [
                "Northern America", "Western Europe", "Eastern Asia", "South America", "Western Europe",
            ],
        }
    )


def gen_ignore_list(dim: pd.DataFrame) -> pd.DataFrame:
    unmon = dim[dim.is_monetized == 0].wiki_id.head(3)
    return pd.DataFrame({"wiki_id": unmon.astype(str), "reason": ["seasonal", "legal", "testing"]})


def gen_wiki_metadata(rng: np.random.RandomState) -> pd.DataFrame:
    rows = []
    for i, wid in enumerate(WIKI_IDS[:15]):
        stale = i % 3 == 0
        refreshed = (ANCHOR - dt.timedelta(days=10 if stale else 2)).isoformat() + "T08:00:00"
        rows.append(
            (
                str(wid), _domain(wid), f"20{rng.randint(10, 24):02d}-01-15T00:00:00",
                int(rng.rand() < 0.7),
                None if i % 4 == 0 else f"summary of wiki {wid}",
                refreshed,
            )
        )
    return pd.DataFrame(
        rows,
        columns=["wiki_id", "wiki_group", "created_at", "is_monetized", "ai_summary", "last_refreshed"],
    )


def generate_all(out_dir: str) -> dict[str, str]:
    """Generate every fixture table as parquet under out_dir; idempotent."""
    os.makedirs(out_dir, exist_ok=True)
    paths = {}
    marker = os.path.join(out_dir, ".complete")
    if os.path.exists(marker):
        for name in ["analytics_events", "taxonomy", "dimension_wikis", "dimension_users",
                     "country_map", "ignore_list", "wiki_metadata"]:
            paths[name] = os.path.join(out_dir, f"{name}.parquet")
        return paths
    rng = np.random.RandomState(42)
    events = gen_events(rng)
    dim = gen_dimension_wikis(rng)
    tables: dict[str, pa.Table] = {
        "analytics_events": pa.Table.from_pandas(events, preserve_index=False),
        "taxonomy": gen_taxonomy(rng),
        "dimension_wikis": pa.Table.from_pandas(dim, preserve_index=False),
        "dimension_users": pa.Table.from_pandas(gen_dimension_users(), preserve_index=False),
        "country_map": pa.Table.from_pandas(gen_country_map(), preserve_index=False),
        "ignore_list": pa.Table.from_pandas(gen_ignore_list(dim), preserve_index=False),
        "wiki_metadata": pa.Table.from_pandas(gen_wiki_metadata(rng), preserve_index=False),
    }
    for name, table in tables.items():
        p = os.path.join(out_dir, f"{name}.parquet")
        pq.write_table(table, p)
        paths[name] = p
    open(marker, "w").write("ok")
    return paths
