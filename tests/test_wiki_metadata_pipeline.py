"""End-to-end WikiMetadata pipeline: structure, determinism, crossover
format, taxonomy JSON cells, and upsert behavior."""

from __future__ import annotations

import json
import re

import pytest
from pyspark.sql import functions as F

from magi_etl_spark.pipelines.wiki_metadata import (
    attribute_json_strings,
    events_taxonomy_unity,
    taxonomy_flatten,
    wiki_attribute_confidences,
    wiki_metadata_pipeline,
)
from tests.magi_fixtures import ANCHOR, generate_all


@pytest.fixture(scope="module")
def magi(tmp_path_factory):
    return generate_all(str(tmp_path_factory.mktemp("magi_wm") / "tables"))


@pytest.fixture(scope="module")
def wdfs(spark, magi):
    return {name: spark.read.parquet(path) for name, path in magi.items()}


@pytest.fixture(scope="module")
def result(wdfs):
    return wiki_metadata_pipeline(
        wdfs["analytics_events"],
        wdfs["dimension_wikis"],
        wdfs["dimension_users"],
        wdfs["taxonomy"],
        prior_metadata=None,
        anchor_date=ANCHOR,
    ).persist()


def test_record_structure(result):
    cols = set(result.columns)
    assert {
        "wiki_id", "wiki_group", "users_30_days", "sessions_30_days",
        "pageviews_30_days", "taxonomy_themes", "taxonomy_genres",
        "taxonomy_subgenres", "crossover_wikis", "ai_summary", "ai_flags",
        "last_refreshed",
    } <= cols
    rows = result.collect()
    assert len(rows) > 0
    assert all(r.last_refreshed == "2025-02-28T00:00:00" for r in rows)


def test_crossover_format(result):
    pattern = re.compile(r"^.+ \[\d+\] \| \d+%$")
    with_cross = [r for r in result.collect() if r.crossover_wikis]
    assert with_cross, "no crossovers produced"
    for r in with_cross[:10]:
        for entry in r.crossover_wikis.split(","):
            assert pattern.match(entry), entry


def test_taxonomy_json_cells(result):
    with_tax = [r for r in result.collect() if r.taxonomy_themes]
    assert with_tax
    for r in with_tax[:10]:
        confidences = []
        for cell in r.taxonomy_themes.split(","):
            parsed = json.loads(cell)
            assert len(parsed) == 1
            (conf,) = parsed.values()
            assert conf >= 0.6  # threshold applied
            confidences.append(conf)
        assert confidences == sorted(confidences, reverse=True)  # ordered cells


def test_confidence_threshold_and_trycast(spark, wdfs):
    flat = taxonomy_flatten(wdfs["taxonomy"])
    unity = events_taxonomy_unity(wdfs["analytics_events"], flat, ANCHOR)
    conf = wiki_attribute_confidences(unity, "theme", 0.6)
    vals = conf.agg(F.min("confidence")).collect()[0][0]
    assert vals is not None and vals >= 0.6


def test_pipeline_deterministic(wdfs, result):
    again = wiki_metadata_pipeline(
        wdfs["analytics_events"], wdfs["dimension_wikis"], wdfs["dimension_users"],
        wdfs["taxonomy"], prior_metadata=None, anchor_date=ANCHOR,
    )
    a = {r.wiki_id: (r.crossover_wikis, r.taxonomy_themes, r.ai_flags) for r in result.collect()}
    b = {r.wiki_id: (r.crossover_wikis, r.taxonomy_themes, r.ai_flags) for r in again.collect()}
    assert a == b


def test_upsert_with_prior(spark, wdfs, result):
    prior = spark.createDataFrame(
        [("999999", "stale.acme.com", "old summary", "2020-01-01T00:00:00")],
        "wiki_id string, wiki_group string, ai_summary string, last_refreshed string",
    )
    merged = wiki_metadata_pipeline(
        wdfs["analytics_events"], wdfs["dimension_wikis"], wdfs["dimension_users"],
        wdfs["taxonomy"], prior_metadata=prior, anchor_date=ANCHOR,
    )
    rows = {r.wiki_id: r for r in merged.collect()}
    assert "999999" in rows  # prior-only row survives
    assert rows["999999"].ai_summary == "old summary"
    fresh = [r for k, r in rows.items() if k != "999999"]
    assert all(r.last_refreshed == "2025-02-28T00:00:00" for r in fresh)
