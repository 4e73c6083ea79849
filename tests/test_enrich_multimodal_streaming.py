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


def test_multimodal_non_png_raises_or_nulls(media):
    # on_error="raise" surfaces the decode failure for non-PNG payloads
    with pytest.raises(Exception, match="PNG"):
        extract_features(media, on_error="raise").collect()
    # default policy: corrupt/unknown blobs -> NULL features, job survives
    rows = {r.media_id: r for r in extract_features(media).collect()}
    assert rows[1].features is None and rows[2].features is None


def _rgb_png() -> tuple[bytes, list[int]]:
    from magi_etl_spark.operators.multimodal import png_encode

    # 2x2 RGB: red, green / blue, white
    samples = [255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255]
    return png_encode(2, 2, 3, bytes(samples)), samples


def test_png_roundtrip_and_real_decode():
    from magi_etl_spark.operators.multimodal import png_decode, real_image_decode

    payload, samples = _rgb_png()
    w, h, ch, out = png_decode(payload)
    assert (w, h, ch) == (2, 2, 3) and list(out) == samples
    feats = real_image_decode(payload)
    assert feats[:4] == [2.0, 2.0, 3.0, 12.0]
    # channel means: R=(255+0+0+255)/4, G=(0+255+0+255)/4, B=(0+0+255+255)/4
    assert feats[4] == pytest.approx(510 / 4 / 255)
    assert feats[5] == pytest.approx(510 / 4 / 255)
    assert feats[6] == pytest.approx(510 / 4 / 255)
    assert feats[7] == 0.0  # padded 4th channel


def test_png_decode_all_filter_types():
    """Hand-filter scanlines with each PNG filter type and check the
    decoder reconstructs the original pixels."""
    import struct
    import zlib

    from magi_etl_spark.operators.multimodal import png_decode

    width, height, ch = 4, 5, 2  # grey+alpha
    img = [[(x * 37 + y * 91 + c * 13) % 256 for x in range(width) for c in range(ch)]
           for y in range(height)]
    stride = width * ch
    raw = bytearray()
    prev = [0] * stride
    for y, line in enumerate(img):
        f = y % 5  # exercise filters 0..4
        raw.append(f)
        for i in range(stride):
            a = line[i - ch] if i >= ch else 0
            b = prev[i]
            c = prev[i - ch] if i >= ch else 0
            if f == 0:
                enc = line[i]
            elif f == 1:
                enc = line[i] - a
            elif f == 2:
                enc = line[i] - b
            elif f == 3:
                enc = line[i] - ((a + b) >> 1)
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc = line[i] - pred
            raw.append(enc & 0xFF)
        prev = line

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    payload = (b"\x89PNG\r\n\x1a\n"
               + chunk(b"IHDR", struct.pack(">IIBBBBB", width, height, 8, 4, 0, 0, 0))
               + chunk(b"IDAT", zlib.compress(bytes(raw)))
               + chunk(b"IEND", b""))
    w, h, c, out = png_decode(payload)
    assert (w, h, c) == (width, height, ch)
    assert list(out) == [v for line in img for v in line]


def test_multimodal_real_png_through_spark(spark):
    payload, _ = _rgb_png()
    df = spark.createDataFrame(
        [(1, "image", payload, ("png", 2, 2, None)),
         (2, "image", b"\xff\xd8\xffnot-a-png", ("jpg", 1, 1, None))],
        "media_id long, media_type string, payload binary,"
        " meta struct<format:string,width:int,height:int,duration_ms:long>",
    )
    rows = {r.media_id: r for r in extract_features(df).collect()}
    assert rows[1].features[:3] == [2.0, 2.0, 3.0]
    assert rows[2].features is None  # undecodable -> NULL, job survives


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
    from magi_etl_spark.tables import load_table

    batch = (
        load_table(spark, sf_dir, "events")
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


def _stereo_wav() -> tuple[bytes, int]:
    import math

    from magi_etl_spark.operators.multimodal import wav_encode

    rate = 8000
    n = 800  # 0.1s
    left = [math.sin(2 * math.pi * 440 * i / rate) * 0.5 for i in range(n)]
    right = [0.25] * n  # constant positive: zero crossings only on left
    return wav_encode(rate, [left, right]), rate


def test_wav_roundtrip_and_real_decode():
    from magi_etl_spark.operators.multimodal import real_audio_decode, wav_decode

    payload, rate = _stereo_wav()
    got_rate, ch, frames, chans = wav_decode(payload)
    assert (got_rate, ch, frames) == (rate, 2, 800)
    assert chans[1][0] == pytest.approx(0.25, abs=1 / 32768)
    feats = real_audio_decode(payload)
    assert feats[0] == rate and feats[1] == 2.0 and feats[2] == 800.0
    assert feats[3] == pytest.approx(0.1)  # duration
    # sine RMS = A/sqrt(2); constant channel RMS = its value
    assert feats[4] == pytest.approx(0.5 / 2**0.5, rel=1e-3)
    assert feats[5] == pytest.approx(0.25, rel=1e-3)
    assert feats[6] == pytest.approx(0.5, rel=1e-3)  # peak
    assert 0.0 < feats[7] < 0.1  # 440Hz at 8kHz: ~88 crossings / 1598 slots


def test_wav_8bit_and_error_paths():
    from magi_etl_spark.operators.multimodal import wav_decode, wav_encode

    payload = wav_encode(4000, [[0.0, 0.5, -0.5, 1.0]], bits=8)
    rate, ch, frames, chans = wav_decode(payload)
    assert (rate, ch, frames) == (4000, 1, 4)
    assert chans[0][1] == pytest.approx(0.5, abs=1 / 128)
    with pytest.raises(ValueError, match="RIFF"):
        wav_decode(b"\x89PNG\r\n\x1a\nnot-audio")
    with pytest.raises(ValueError, match="truncated"):
        wav_decode(b"RIFF\x04\x00\x00\x00WAVE")


def test_multimodal_real_wav_through_spark(spark):
    from magi_etl_spark.operators.multimodal import extract_features, real_audio_decode

    payload, rate = _stereo_wav()
    df = spark.createDataFrame(
        [
            (1, "audio", payload, ("wav", None, None, 100)),
            (2, "audio", b"\x00garbage", ("mp3", None, None, 100)),
            (3, "image", payload, ("png", 1, 1, None)),  # wrong type: passthrough
        ],
        "media_id long, media_type string, payload binary,"
        " meta struct<format:string,width:int,height:int,duration_ms:long>",
    )
    rows = {
        r.media_id: r
        for r in extract_features(
            df, decoder=real_audio_decode, media_type="audio"
        ).collect()
    }
    assert rows[1].features[0] == float(rate)
    assert rows[2].features is None  # undecodable -> NULL, job survives
    assert rows[3].features is None  # non-audio row passes through


def test_video_container_end_to_end(spark):
    """Full video path with REAL codecs: a length-prefixed container of
    PNG frames -> sample_frames slices a frame per grid timestamp ->
    real_image_decode features per frame.  Proves the plumbing carries
    actual pixels, not just fakes."""
    import struct

    from magi_etl_spark.operators.multimodal import (
        extract_features,
        png_encode,
        real_image_decode,
        sample_frames,
    )

    # container: [u32 frame_len, png_bytes] * n, one frame per 100ms
    frames = [
        png_encode(2, 1, 3, bytes([c, 0, 0, 0, c, 0]))  # R then G ramp
        for c in (10, 200, 90)
    ]
    payload = b"".join(struct.pack(">I", len(f)) + f for f in frames)

    def extract(container: bytes, ts_ms: int) -> bytes:
        idx, pos = ts_ms // 100, 0
        for _ in range(idx):
            (ln,) = struct.unpack(">I", container[pos : pos + 4])
            pos += 4 + ln
        (ln,) = struct.unpack(">I", container[pos : pos + 4])
        return bytes(container[pos + 4 : pos + 4 + ln])

    video = spark.createDataFrame(
        [(7, "video", payload, ("pngv", 2, 1, 200))],
        "media_id long, media_type string, payload binary,"
        " meta struct<format:string,width:int,height:int,duration_ms:long>",
    )
    framed = sample_frames(video, every_ms=100, frame_extractor=extract)
    rows = sorted(framed.collect(), key=lambda r: r.frame_ts_ms)
    assert [r.frame_ts_ms for r in rows] == [0, 100, 200]
    # decode each sampled frame with the real PNG codec
    reds = [real_image_decode(bytes(r.frame))[4] for r in rows]
    # mean over the two pixels: red channel is (c + 0) / 2
    assert reds == pytest.approx([10 / 2 / 255, 200 / 2 / 255, 90 / 2 / 255])
    # and the frames flow on through extract_features as image rows
    as_media = framed.select(
        F.col("media_id"), F.lit("image").alias("media_type"),
        F.col("frame").alias("payload"),
    )
    feats = extract_features(as_media).collect()
    assert all(r.features is not None and r.features[2] == 3.0 for r in feats)
