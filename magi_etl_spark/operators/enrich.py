"""Pluggable row-enrichment stages (reference F3/F4: LLM summary
``ai_analyze_wiki`` ``dash_app/tasks.py:1092-1159``; poster scrape
``get_wiki_poster`` ``tasks.py:1070-1090``).

The enricher is a plain ``pandas.DataFrame -> pandas.DataFrame`` callable
executed through ``mapInPandas`` — Arrow-batched, executor-side, with
batch-level rate limiting.  Network/LLM transports are injected; tests use
the deterministic fakes below.
"""

from __future__ import annotations

import hashlib
import re
import time
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame

AI_FLAG_NAMES = ("roblox", "illegal", "kids", "nsfw", "ai_generated")

AI_SCHEMA_SUFFIX = (
    "ai_summary string, ai_news string, ai_franchise string, ai_flags string"
)


def enrich_with(
    df: DataFrame,
    enricher: Callable[[pd.DataFrame], pd.DataFrame],
    added_schema: str,
    batch_rows: int = 64,
    sleep_between_batches: float = 0.0,
) -> DataFrame:
    """Append enricher-produced columns via mapInPandas.

    The enricher sees up-to-``batch_rows`` row batches (mirrors the
    reference's per-call granularity + 2s sleep, ``tasks.py:1093``) and
    must return one row per input row with ONLY the added columns.
    """
    out_schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields]
        + [added_schema]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        first = True
        for pdf in batches:
            for lo in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[lo : lo + batch_rows]
                if not first and sleep_between_batches:
                    time.sleep(sleep_between_batches)
                first = False
                added = enricher(chunk.reset_index(drop=True))
                yield pd.concat(
                    [chunk.reset_index(drop=True), added.reset_index(drop=True)], axis=1
                )

    return df.mapInPandas(run, schema=out_schema)


def fake_media_summary(batch: pd.DataFrame) -> pd.DataFrame:
    """Deterministic stand-in for the LLM MediaSummary enrichment: fields
    derived from a content hash, flags as the reference's python-dict
    string format (parsed downstream with ``ast.literal_eval``,
    ``tasks.py:1217``)."""
    key = batch.iloc[:, 0].astype(str)
    digest = key.map(lambda s: hashlib.md5(s.encode()).hexdigest())
    flags = digest.map(
        lambda h: str({name: bool(int(h[i], 16) % 2) for i, name in enumerate(AI_FLAG_NAMES)})
    )
    return pd.DataFrame(
        {
            "ai_summary": "Summary of " + key,
            "ai_news": "No notable news for " + key,
            "ai_franchise": "franchise_" + digest.str[:2],
            "ai_flags": flags,
        }
    )


def make_poster_enricher(
    fetch_html: Callable[[str], str], url_col: str = "url"
) -> Callable[[pd.DataFrame], pd.DataFrame]:
    """og:image scrape (reference F4) with the HTTP fetch injected; the
    meta-tag extraction is a regex equivalent of the bs4 lookup."""
    og = re.compile(
        r'<meta[^>]+property=["\']og:image["\'][^>]+content=["\']([^"\']+)["\']',
        re.IGNORECASE,
    )

    def enrich(batch: pd.DataFrame) -> pd.DataFrame:
        posters = []
        for u in batch[url_col].astype(str):
            try:
                m = og.search(fetch_html(u) or "")
                posters.append(m.group(1) if m else None)
            except Exception:
                posters.append(None)
        return pd.DataFrame({"poster_url": posters})

    return enrich
