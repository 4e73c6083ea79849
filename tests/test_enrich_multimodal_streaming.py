"""Tests for the pluggable enrichment stages, multimodal binary plumbing,
and the Structured Streaming extension."""

from __future__ import annotations

import ast

import pytest
from pyspark.sql import functions as F

from magi_etl_spark.operators.enrich import (
    AI_FLAG_NAMES,
    AI_SCHEMA_SUFFIX,
    enrich_with,
    fake_media_summary,
    make_poster_enricher,
)
from magi_etl_spark.operators.multimodal import (
    extract_features,
    fake_image_decoder,
    sample_frames,
)


def test_ai_enrichment_mapinpandas(spark):
    df = spark.createDataFrame(
        [(f"w{i}.acme.com", i) for i in range(10)], "domain string, wiki_id int"
    )
    out = enrich_with(df, fake_media_summary, AI_SCHEMA_SUFFIX, batch_rows=3)
    rows = out.collect()
    assert len(rows) == 10
    r = next(r for r in rows if r.domain == "w3.acme.com")
    assert r.ai_summary == "Summary of w3.acme.com"
    flags = ast.literal_eval(r.ai_flags)  # reference parses with literal_eval
    assert set(flags) == set(AI_FLAG_NAMES)
    # determinism: same input -> same enrichment
    again = enrich_with(df, fake_media_summary, AI_SCHEMA_SUFFIX).collect()
    assert {x.ai_flags for x in rows} == {x.ai_flags for x in again}


def test_poster_enricher_og_image(spark):
    pages = {
        "https://w1.acme.com": '<html><meta property="og:image" content="https://img/w1.png"></html>',
        "https://w2.acme.com": "<html>no og tag</html>",
    }
    df = spark.createDataFrame([(u,) for u in pages], "url string")
    out = enrich_with(
        df, make_poster_enricher(lambda u: pages.get(u, "")), "poster_url string"
    )
    got = {r.url: r.poster_url for r in out.collect()}
    assert got["https://w1.acme.com"] == "https://img/w1.png"
    assert got["https://w2.acme.com"] is None


@pytest.fixture()
def media(spark):
    rows = [
        (1, "image", b"img-one-bytes", ("png", 64, 64, None)),
        (2, "image", b"img-two-bytes", ("jpg", 32, 32, None)),
        (3, "video", b"vid-bytes", ("mp4", 640, 480, 2500)),
        (4, "image", None, ("png", 0, 0, None)),
    ]
    return spark.createDataFrame(
        rows,
        "media_id long, media_type string, payload binary,"
        " meta struct<format:string,width:int,height:int,duration_ms:long>",
    )


def test_multimodal_feature_extraction(media):
    out = extract_features(media, decoder=fake_image_decoder)
    rows = {r.media_id: r for r in out.collect()}
    assert len(rows[1].features) == 8 and all(0 <= v <= 1 for v in rows[1].features)
    assert rows[1].features != rows[2].features  # payload-dependent
    assert rows[3].features is None  # video passes through
    assert rows[4].features is None  # NULL payload safe


def test_multimodal_stub_raises_cleanly(media):
    with pytest.raises(Exception, match="codec|NotImplemented"):
        extract_features(media).collect()


def test_frame_sampling_grid(media):
    grid = sample_frames(media, every_ms=1000)
    got = sorted((r.media_id, r.frame_ts_ms) for r in grid.collect())
    assert got == [(3, 0), (3, 1000), (3, 2000)]
    framed = sample_frames(media, every_ms=1000, frame_extractor=lambda p, t: p[:2] + str(t).encode())
    rows = sorted((r.frame_ts_ms, bytes(r.frame)) for r in framed.collect())
    assert rows[0] == (0, b"vi0") and rows[-1] == (2000, b"vi2000")


def test_streaming_windowed_counts(spark, sf_dir, tmp_path):
    from magi_etl_spark.streaming.events_stream import (
        run_to_memory,
        sessionized_stream,
        stream_events,
        windowed_event_counts,
    )

    import shutil

    # the streaming file source requires a directory of files
    src_dir = tmp_path / "events_stream"
    src_dir.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", src_dir / "part-0.parquet")
    src = f"{sf_dir}/events.parquet"
    stream = stream_events(spark, str(src_dir))
    assert stream.isStreaming
    run_to_memory(windowed_event_counts(stream, "1 day", "1 day"), "daily_counts")
    daily = spark.sql("select * from daily_counts")
    batch = (
        spark.read.parquet(src)
        .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        .groupBy(F.date_trunc("day", "ts").alias("d"), "event_type")
        .count()
    )
    assert daily.count() == batch.count()  # same (day, type) groups
    n = daily.agg(F.sum("n")).collect()[0][0]
    assert n == spark.read.parquet(src).count()

    run_to_memory(sessionized_stream(stream), "sessions")
    sess = spark.sql("select * from sessions")
    assert sess.count() > 0
    assert sess.where(F.col("session_end") < F.col("session_start")).count() == 0
