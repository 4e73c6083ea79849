"""Multimodal columns: image/audio/video as opaque binary + typed
metadata (LLM-training-pipeline extension; no counterpart in the
reference, which is tabular-only).

The Spark-side plumbing — schema, Arrow batching through mapInPandas,
partition sizing for large blobs — is real and tested.  The default
decoder is a pure-stdlib PNG codec (zlib + struct; no external media
libraries needed); other formats are pluggable via
``extract_features(decoder=...)`` (e.g. a PIL-backed callable), and
``fake_image_decoder`` exercises the Arrow path without any codec.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("format", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                ]
            ),
        ),
    ]
)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # grey, RGB, grey+alpha, RGBA


def png_decode(payload: bytes) -> tuple[int, int, int, bytes]:
    """Pure-stdlib PNG decode: signature + chunk walk (struct), IDAT
    reassembly + inflate (zlib), per-scanline unfilter (filters 0-4).

    Supports 8-bit non-interlaced greyscale / RGB / grey+alpha / RGBA —
    the common training-corpus cases.  Returns ``(width, height,
    channels, samples)`` with samples as row-major interleaved bytes.
    Raises ValueError for non-PNG or unsupported variants (inject a
    PIL-backed decoder into ``extract_features`` for those).
    """
    if not payload or bytes(payload[:8]) != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = 8
    w = h = color_type = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = bytes(payload[pos + 4 : pos + 8])
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # data + length/type/CRC words
        if ctype == b"IHDR":
            w, h, bit_depth, color_type, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if bit_depth != 8 or interlace != 0 or color_type not in _PNG_CHANNELS:
                raise ValueError(
                    "unsupported PNG variant (need 8-bit non-interlaced "
                    "grey/RGB/grey+alpha/RGBA)"
                )
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if w is None or not idat:
        raise ValueError("truncated PNG (missing IHDR or IDAT)")
    channels = _PNG_CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise ValueError("corrupt PNG scanline data")
    out = bytearray()
    prev = bytearray(stride)
    p = 0
    for _ in range(h):
        f = raw[p]
        line = bytearray(raw[p + 1 : p + 1 + stride])
        p += 1 + stride
        if f == 1:  # Sub
            for i in range(channels, stride):
                line[i] = (line[i] + line[i - channels]) & 0xFF
        elif f == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                b = prev[i]
                c = prev[i - channels] if i >= channels else 0
                pp = a + b - c
                pa, pb, pc = abs(pp - a), abs(pp - b), abs(pp - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        elif f != 0:
            raise ValueError(f"bad PNG filter type {f}")
        out += line
        prev = line
    return w, h, channels, bytes(out)


def png_encode(width: int, height: int, channels: int, samples: bytes) -> bytes:
    """Minimal stdlib PNG writer (filter 0, one IDAT) — the round-trip
    partner of :func:`png_decode` for tests and fixture generation."""
    color_type = {1: 0, 3: 2, 2: 4, 4: 6}[channels]
    stride = width * channels
    raw = b"".join(
        b"\x00" + bytes(samples[y * stride : (y + 1) * stride]) for y in range(height)
    )

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def real_image_decode(payload: bytes) -> list[float]:
    """Decode one real image (PNG via the stdlib codec above) into 8
    features: width, height, channels, n_samples, then per-channel means
    scaled to [0,1] (zero-padded to 4 channels).  Non-PNG payloads raise
    ValueError — plug a PIL/torchvision-backed callable into
    ``extract_features(decoder=...)`` for other formats."""
    w, h, ch, samples = png_decode(payload)
    means = []
    for c in range(ch):
        vals = samples[c::ch]
        means.append(sum(vals) / len(vals) / 255.0 if vals else 0.0)
    means += [0.0] * (4 - len(means))
    return [float(w), float(h), float(ch), float(len(samples)), *means]


_WAV_FMT_PCM = 1


def wav_decode(payload: bytes) -> tuple[int, int, int, list[list[float]]]:
    """Pure-stdlib RIFF/WAVE decode: chunk walk (struct) over
    ``fmt ``/``data``, 8- or 16-bit integer PCM.

    Returns ``(sample_rate, channels, n_frames, samples)`` with samples
    as one list per channel, normalized to [-1.0, 1.0].  Raises
    ValueError for non-WAV or non-PCM payloads (inject a soundfile/
    pydub-backed decoder into ``extract_features`` for those)."""
    if len(payload) < 12 or bytes(payload[:4]) != b"RIFF" or bytes(payload[8:12]) != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    rate = channels = bits = None
    data = None
    while pos + 8 <= len(payload):
        ctype = bytes(payload[pos : pos + 4])
        (length,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + length]
        pos += 8 + length + (length & 1)  # chunks are word-aligned
        if ctype == b"fmt ":
            fmt, channels, rate, _byte_rate, _align, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if fmt != _WAV_FMT_PCM or bits not in (8, 16):
                raise ValueError("unsupported WAV variant (need 8/16-bit PCM)")
        elif ctype == b"data":
            data = body
    if rate is None or data is None:
        raise ValueError("truncated WAV (missing fmt or data chunk)")
    if bits == 16:
        n = len(data) // 2
        ints = struct.unpack(f"<{n}h", data[: n * 2])
        flat = [v / 32768.0 for v in ints]
    else:  # 8-bit PCM is unsigned, midpoint 128
        flat = [(b - 128) / 128.0 for b in data]
    n_frames = len(flat) // channels
    samples = [flat[c::channels][:n_frames] for c in range(channels)]
    return rate, channels, n_frames, samples


def wav_encode(
    sample_rate: int, channels: list[list[float]], bits: int = 16
) -> bytes:
    """Minimal stdlib WAV writer (integer PCM) — the round-trip partner
    of :func:`wav_decode` for tests and fixture generation."""
    n_ch = len(channels)
    n_frames = len(channels[0]) if channels else 0
    interleaved = [channels[c][i] for i in range(n_frames) for c in range(n_ch)]
    if bits == 16:
        clip = [max(-32768, min(32767, round(v * 32768.0))) for v in interleaved]
        data = struct.pack(f"<{len(clip)}h", *clip)
    elif bits == 8:
        clip = [max(0, min(255, round(v * 128.0) + 128)) for v in interleaved]
        data = bytes(clip)
    else:
        raise ValueError("bits must be 8 or 16")
    block = n_ch * bits // 8
    fmt = struct.pack(
        "<HHIIHH", _WAV_FMT_PCM, n_ch, sample_rate, sample_rate * block, block, bits
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def real_audio_decode(payload: bytes) -> list[float]:
    """Decode one real audio clip (WAV via the stdlib codec above) into 8
    features: sample_rate, channels, n_frames, duration_sec, per-channel
    RMS (zero-padded to 2), overall peak amplitude, and mean
    zero-crossing rate — the cheap clip-level stats a corpus filter
    keys on (silence/clipping/sample-rate gates)."""
    rate, n_ch, n_frames, chans = wav_decode(payload)
    rms = [
        (sum(v * v for v in ch) / len(ch)) ** 0.5 if ch else 0.0 for ch in chans
    ]
    peak = max((max(abs(v) for v in ch) for ch in chans if ch), default=0.0)
    crossings = 0
    for ch in chans:
        crossings += sum(
            1 for a, b in zip(ch, ch[1:]) if (a >= 0) != (b >= 0)
        )
    zcr = crossings / (n_ch * max(1, n_frames - 1))
    return [
        float(rate),
        float(n_ch),
        float(n_frames),
        n_frames / rate if rate else 0.0,
        *(rms[:2] + [0.0] * (2 - len(rms[:2]))),
        float(peak),
        float(zcr),
    ]


def fake_image_decoder(payload: bytes) -> list[float]:
    """Deterministic stand-in: 8 pseudo-features from the payload digest —
    exercises the full Arrow/batching path without a codec."""
    h = hashlib.md5(payload or b"").digest()
    return [b / 255.0 for b in h[:8]]


def extract_features(
    media: DataFrame,
    decoder: Callable[[bytes], list[float]] | None = None,
    feature_len: int = 8,
    media_type: str = "image",
    on_error: str = "null",
) -> DataFrame:
    """binary payload -> features array<double> via Arrow-batched
    mapInPandas.  Rows of other media types pass through with NULL
    features (schema-stable).  ``on_error="null"`` (default) maps
    undecodable payloads to NULL features instead of failing the job —
    at corpus scale a fraction of blobs is always corrupt and one bad
    row must not kill a 1000-executor pass; set ``on_error="raise"``
    to surface decode bugs in tests."""
    dec = decoder or real_image_decode
    out_schema = "media_id long, media_type string, features array<double>"

    def safe(p: bytes) -> list[float] | None:
        try:
            return dec(p)
        except Exception:
            if on_error == "raise":
                raise
            return None

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                safe(p) if (t == media_type and p is not None) else None
                for t, p in zip(pdf["media_type"], pdf["payload"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "features": feats,
                }
            )

    # Blob columns dominate partition size: cap rows per partition via
    # maxRecordsPerBatch-style splitting upstream when payloads are large.
    return media.select("media_id", "media_type", "payload").mapInPandas(
        run, schema=out_schema
    )


def sample_frames(
    media: DataFrame,
    every_ms: int,
    frame_extractor: Callable[[bytes, int], bytes] | None = None,
) -> DataFrame:
    """Video -> (media_id, frame_ts_ms, frame binary).  The timestamp grid
    comes from metadata (pure Spark: sequence + explode); the pixel work is
    the injected ``frame_extractor(payload, ts_ms)``."""
    grid = media.where(F.col("media_type") == "video").select(
        "media_id",
        "payload",
        F.explode(
            F.sequence(F.lit(0), F.col("meta.duration_ms"), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
    if frame_extractor is None:
        return grid.select("media_id", "frame_ts_ms")  # plan-only: no codec

    out_schema = "media_id long, frame_ts_ms long, frame binary"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "frame_ts_ms": pdf["frame_ts_ms"],
                    "frame": [
                        frame_extractor(p, int(t))
                        for p, t in zip(pdf["payload"], pdf["frame_ts_ms"])
                    ],
                }
            )

    return grid.mapInPandas(run, schema=out_schema)


def synthesize_test_images(
    ids: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """``(media_id, media_type, payload)``: one REAL grayscale PNG per
    input id, pixels generated by a closed-form formula of the id —
    ``width = 4 + id % 5``, ``height = 3 + id % 4``, ``sample[k] =
    (id * 31 + k * 7) % 256``.  Built distributed via Arrow-batched
    mapInPandas (the encode cost scales out with the ids), and because
    the pixel law is closed-form, a SQL oracle can predict the decoded
    feature vector without any codec — which is exactly how the q123
    gate query hash-checks the REAL png_encode → png_decode → feature
    path end to end."""
    out_schema = "media_id long, media_type string, payload binary"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for i in pdf[id_col]:
                i = int(i)
                w, h = 4 + i % 5, 3 + i % 4
                samples = bytes((i * 31 + k * 7) % 256 for k in range(w * h))
                payloads.append(png_encode(w, h, 1, samples))
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64"),
                    "media_type": "image",
                    "payload": payloads,
                }
            )

    return ids.select(id_col).mapInPandas(run, schema=out_schema)


def synthesize_test_audio(
    ids: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """``(media_id, media_type, payload)``: one REAL mono 16-bit PCM
    WAV per input id — ``rate = 8000 + (id % 4) * 4000``, ``n_frames =
    50 + id % 20``, integer sample ``s[k] = ((id * 37 + k * 11) % 4096)
    - 2048`` stored as amplitude ``s[k] / 32768`` (dyadic, so the
    encode→decode round trip is bit-exact and a SQL oracle can predict
    every decoded feature arithmetically — the audio twin of
    ``synthesize_test_images``)."""
    out_schema = "media_id long, media_type string, payload binary"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for i in pdf[id_col]:
                i = int(i)
                rate = 8000 + (i % 4) * 4000
                n = 50 + i % 20
                ch = [((i * 37 + k * 11) % 4096 - 2048) / 32768.0 for k in range(n)]
                payloads.append(wav_encode(rate, [ch], bits=16))
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64"),
                    "media_type": "audio",
                    "payload": payloads,
                }
            )

    return ids.select(id_col).mapInPandas(run, schema=out_schema)


def average_hash(
    media: DataFrame,
    grid: int = 4,
    decoder: Callable[[bytes], tuple[int, int, int, bytes]] | None = None,
    media_type: str = "image",
    on_error: str = "null",
) -> DataFrame:
    """Perceptual average-hash (aHash) of image payloads:
    ``media_id, phash`` where ``phash`` packs ``grid x grid`` bits —
    bit j set iff the nearest-neighbor-downsampled pixel j is at or
    above the grid's mean — into a BIGINT (grid <= 8, so <= 64 bits).

    The comparison is ALL-INTEGER (``pixel * grid^2 >= sum(pixels)``),
    so the hash is engine-portable: for closed-form synthetic images
    (``synthesize_test_images``) a SQL oracle predicts it without any
    codec, which is how the gate query hash-checks the real
    png_encode -> png_decode -> downsample path end to end.

    Near-identical images (resize artifacts, recompression, small
    overlays) land within a few bits of each other — pair with
    ``phash_near_dup_pairs`` for the banded near-dup join.  Shape:
    pure map over Arrow batches, no shuffle.
    """
    if grid > 8:
        raise ValueError("grid > 8 would overflow the 64-bit phash")
    dec = decoder or png_decode
    cells = grid * grid
    out_schema = "media_id long, phash long"

    def one(payload: bytes) -> int | None:
        try:
            w, h, channels, samples = dec(payload)
            if channels != 1:
                # luma = integer mean of the channels (good enough for
                # a perceptual bit mask; keeps the math integer)
                samples = bytes(
                    sum(samples[p * channels + c] for c in range(channels))
                    // channels
                    for p in range(w * h)
                )
            px = [
                samples[(r * h // grid) * w + (c * w // grid)]
                for r in range(grid)
                for c in range(grid)
            ]
            total = sum(px)
            bits = 0
            for j, v in enumerate(px):
                if v * cells >= total:
                    bits |= 1 << j
            return bits
        except Exception:
            if on_error == "raise":
                raise
            return None

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hashes = [
                one(p) if (t == media_type and p is not None) else None
                for t, p in zip(pdf["media_type"], pdf["payload"])
            ]
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "phash": hashes}
            ).astype({"media_id": "int64", "phash": "object"})

    return media.select("media_id", "media_type", "payload").mapInPandas(
        run, schema=out_schema
    )


def phash_near_dup_pairs(
    hashes: DataFrame,
    max_dist: int = 2,
    n_bands: int | None = None,
    bits: int = 16,
    id_col: str = "media_id",
    hash_col: str = "phash",
) -> DataFrame:
    """Image near-duplicate pairs by Hamming distance over perceptual
    hashes: ``id_a, id_b, hamming`` (id_a < id_b, hamming <= max_dist).

    Scale shape — banded blocking with a pigeonhole guarantee: the
    ``bits``-bit hash splits into ``n_bands`` equal contiguous bands
    (default: the smallest divisor of ``bits`` that is > ``max_dist``,
    so every bit is covered and ``max_dist`` flips cannot touch all
    bands); two hashes within ``max_dist`` bit flips MUST agree on at
    least one band, so candidates come from |bands| keyed self-joins on
    (band_idx, band_value) — never an all-pairs cross join — and the
    exact ``bit_count(xor)`` filter runs per candidate.  Identical
    hashes pair through every band; the final distinct collapses the
    multiplicity.
    """
    if n_bands is None:
        n_bands = next(
            d for d in range(max_dist + 1, bits + 1) if bits % d == 0
        )
    if bits % n_bands != 0:
        raise ValueError(
            f"n_bands={n_bands} must divide bits={bits}: unequal bands "
            "leave uncovered bits and break the pigeonhole recall "
            "guarantee"
        )
    if n_bands <= max_dist:
        raise ValueError(
            f"n_bands={n_bands} <= max_dist={max_dist}: every band could "
            "differ, breaking the pigeonhole recall guarantee"
        )
    band_bits = bits // n_bands
    # r15 optimization: the hash frame feeds BOTH self-join sides, and
    # left lazy each side recompiled the upstream hash derivation
    # (q151's Arrow decode -> downsample -> threshold pipeline ran
    # twice).  One chkpt barrier on the (id, hash) projection — two
    # narrow columns — runs the image pipeline exactly once.
    from magi_etl_spark.chkpt import materialize

    h = materialize(
        hashes.select(
            F.col(id_col).alias("_id"), F.col(hash_col).alias("_h")
        ).where(F.col(hash_col).isNotNull())
    )
    # r15 optimization (guide §8 "decide with small rows"): band and
    # compare DISTINCT HASH VALUES, not ids.  Perceptual hashes repeat
    # heavily (q151 at sf0.1: 5000 ids share 85 values, the hot value
    # covering 1263 ids), so the id-level banded self-join fanned out
    # 16.6M candidate rows and then paid a distinct over the survivors.
    # Value-level banding joins |values|-scale rows, every surviving
    # value pair is found once (distinct over value pairs only), ids are
    # attached by two keyed joins that fan out exactly to the RESULT
    # cardinality, and identical-hash pairs come from one group
    # self-join — no candidate-level distinct exists at all (each id
    # pair is emitted exactly once, under the one value pair its two
    # hashes form).  Identical output; q151 wall 5.0 -> 1.1 s at sf0.1.
    vals = h.select("_h").distinct()
    bandedv = vals.select(
        "_h",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright("_h", b * band_bits)
                        .bitwiseAND(F.lit((1 << band_bits) - 1))
                        .alias("key"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("_b"),
    ).select("_h", "_b.band", "_b.key")
    va = bandedv.select("band", "key", F.col("_h").alias("_va"))
    vb = bandedv.select("band", "key", F.col("_h").alias("_vb"))
    vpairs = (
        va.join(vb, ["band", "key"])
        .filter(F.col("_va") < F.col("_vb"))
        .select(
            "_va",
            "_vb",
            F.bit_count(F.col("_va").bitwiseXOR(F.col("_vb"))).alias(
                "hamming"
            ),
        )
        .filter(F.col("hamming") <= max_dist)
        .distinct()
    )
    ha = h.select(F.col("_h").alias("_va"), F.col("_id").alias("_ida"))
    hb = h.select(F.col("_h").alias("_vb"), F.col("_id").alias("_idb"))
    cross = vpairs.join(ha, "_va").join(hb, "_vb").select(
        F.least("_ida", "_idb").alias("id_a"),
        F.greatest("_ida", "_idb").alias("id_b"),
        "hamming",
    )
    same = (
        h.select(F.col("_h").alias("_va"), F.col("_id").alias("_ida"))
        .join(h.select(F.col("_h").alias("_va"), F.col("_id").alias("_idb")), "_va")
        .filter(F.col("_ida") < F.col("_idb"))
        .select(
            F.col("_ida").alias("id_a"),
            F.col("_idb").alias("id_b"),
            F.lit(0).cast("integer").alias("hamming"),
        )
    )
    return cross.unionByName(same)
