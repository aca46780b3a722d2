"""Multimodal binary-column plumbing: schema, batch shapes,
determinism, and the strict-mode stub marker (SURVEY north star —
decode itself is stubbed; the Spark side is real)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from sparkit_learn_spark.operators.multimodal import (
    decode_images,
    extract_features,
    sample_frames,
)


@pytest.fixture(scope="module")
def blobs(spark):
    rows = [(i, bytes(range(256)) * (i + 1)) for i in range(20)]
    return spark.createDataFrame(rows, schema="item_id long, data binary")


def test_decode_schema_and_determinism(blobs):
    out = decode_images(blobs)
    assert [f.name for f in out.schema.fields] == [
        "item_id", "n_bytes", "format", "width", "height", "checksum",
    ]
    a = out.orderBy("item_id").collect()
    b = decode_images(blobs).orderBy("item_id").collect()
    assert a == b
    assert all(r["n_bytes"] == 256 * (r["item_id"] + 1) for r in a)


def test_strict_mode_raises_stub_marker(blobs):
    with pytest.raises(NotImplementedError, match="STUB"):
        decode_images(blobs, strict=True)


def test_feature_extraction_feeds_similarity(blobs, spark):
    feats = extract_features(blobs, dim=16)
    rows = feats.collect()
    assert all(r["feature_dim"] == 16 for r in rows)
    assert all(0.0 <= x <= 1.0 for r in rows for x in r["feature"])
    # plumbing composes with the similarity operators
    from sparkit_learn_spark.operators.similarity import cosine_topk

    top = cosine_topk(
        feats.select("item_id", "feature"), k=2, id_col="item_id", vec_col="feature"
    )
    assert top.groupBy("qid").count().agg(F.max("count")).first()[0] == 2


def test_real_pil_decode_when_available(spark):
    """The decoder= injection point with a REAL library: build genuine
    PNGs with Pillow, decode them through the unchanged mapInPandas
    plumbing, and check true dimensions/format come back. Skips
    cleanly where Pillow is absent (this container)."""
    pytest.importorskip("PIL")
    import io

    from PIL import Image

    from sparkit_learn_spark.operators.multimodal import pil_image_decoder

    rows = []
    for i, (w, h) in enumerate([(32, 16), (64, 64), (128, 8)]):
        buf = io.BytesIO()
        Image.new("RGB", (w, h), color=(i, i, i)).save(buf, format="PNG")
        rows.append((i, buf.getvalue(), w, h))
    df = spark.createDataFrame(
        [(i, b) for i, b, _, _ in rows], schema="item_id long, data binary"
    )
    got = {r["item_id"]: r for r in
           decode_images(df, decoder=pil_image_decoder()).collect()}
    for i, _, w, h in rows:
        assert (got[i]["width"], got[i]["height"], got[i]["format"]) == (w, h, "png")


def test_frame_sampling_explodes(blobs):
    frames = sample_frames(blobs, every_n_bytes=256)
    got = frames.groupBy("item_id").count().orderBy("item_id").collect()
    # item i has 256*(i+1) bytes -> i+1 frames at stride 256
    assert all(r["count"] == r["item_id"] + 1 for r in got)


def _make_png(width: int, height: int) -> bytes:
    """Hand-rolled minimal valid PNG (8-bit grayscale) — real bytes,
    no imaging library."""
    import struct
    import zlib

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        crc = zlib.crc32(ctype + payload) & 0xFFFFFFFF
        return struct.pack(">I", len(payload)) + ctype + payload + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes(width) for _ in range(height))  # filter 0 rows
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


def _make_wav(rate: int, channels: int, n_frames: int) -> bytes:
    """Real WAV bytes via the stdlib wave module."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(b"\x00\x00" * channels * n_frames)
    return buf.getvalue()


def test_png_header_decode_real_bytes(spark):
    """The pure-Python header decoder must recover exact dimensions
    from REAL generated PNG bytes — no fake, no PIL."""
    from sparkit_learn_spark.operators.multimodal import (
        decode_images,
        header_image_decoder,
    )

    blobs = [(1, _make_png(320, 200)), (2, _make_png(7, 7)), (3, _make_png(1024, 1))]
    df = spark.createDataFrame(blobs, "item_id long, data binary")
    got = {r["item_id"]: r for r in
           decode_images(df, decoder=header_image_decoder()).collect()}
    assert (got[1]["width"], got[1]["height"], got[1]["format"]) == (320, 200, "png")
    assert (got[2]["width"], got[2]["height"]) == (7, 7)
    assert (got[3]["width"], got[3]["height"]) == (1024, 1)
    assert all(len(r["checksum"]) == 16 for r in got.values())


def test_image_header_other_formats():
    """GIF and BMP headers parse locally; garbage raises ValueError."""
    import struct

    import pytest as _pytest

    from sparkit_learn_spark.operators.multimodal import parse_image_header

    gif = b"GIF89a" + struct.pack("<HH", 40, 30) + b"\x00" * 20
    m = parse_image_header(gif)
    assert (m["format"], m["width"], m["height"]) == ("gif", 40, 30)

    bmp = b"BM" + b"\x00" * 16 + struct.pack("<ii", 99, -55) + b"\x00" * 10
    m = parse_image_header(bmp)
    assert (m["format"], m["width"], m["height"]) == ("bmp", 99, 55)

    with _pytest.raises(ValueError, match="unrecognized"):
        parse_image_header(b"not an image at all")


def test_wav_header_decode_real_bytes(spark):
    """decode_audio's default decoder parses REAL stdlib-generated WAV
    bytes: sample rate, channels, bit depth, frame count, duration."""
    from sparkit_learn_spark.operators.multimodal import decode_audio

    blobs = [(1, _make_wav(16000, 1, 16000)), (2, _make_wav(44100, 2, 4410))]
    df = spark.createDataFrame(blobs, "item_id long, data binary")
    got = {r["item_id"]: r for r in decode_audio(df).collect()}
    assert (got[1]["sample_rate"], got[1]["channels"], got[1]["bits_per_sample"]) \
        == (16000, 1, 16)
    assert got[1]["n_frames"] == 16000 and abs(got[1]["duration_s"] - 1.0) < 1e-9
    assert (got[2]["sample_rate"], got[2]["channels"]) == (44100, 2)
    assert abs(got[2]["duration_s"] - 0.1) < 1e-9
    assert all(r["format"] == "wav_pcm" for r in got.values())


def test_feature_extraction_deterministic(spark, sf_dir):
    """q_mm_features' per-value contract: the fake extractor is a pure
    function of the blob bytes — two runs yield identical vectors,
    and every vector has the declared dim."""
    from sparkit_learn_spark.queries.multimodal_q import (
        _blob_frame, _make_image_blob,
    )
    from sparkit_learn_spark.operators.multimodal import extract_features
    from sparkit_learn_spark.catalog import load_table

    d = load_table(spark, sf_dir, "documents").limit(50)
    blobs = _blob_frame(d, _make_image_blob)
    a = extract_features(blobs, dim=16).orderBy("item_id").toPandas()
    b = extract_features(blobs, dim=16).orderBy("item_id").toPandas()
    assert len(a) == 50
    for va, vb in zip(a["feature"], b["feature"]):
        assert list(va) == list(vb) and len(va) == 16


def test_frame_sample_walks_every_frame(spark, sf_dir):
    """Each item's sampled offsets are the exact stride walk of its
    container: 0, 256, ..., n_frames*256 (header + every frame)."""
    from sparkit_learn_spark.registry import all_queries

    got = all_queries()["q_mm_frame_sample"](spark, sf_dir).toPandas()
    per = got.groupby("item_id")
    for iid, g in list(per)[:20]:
        offs = sorted(g["byte_offset"])
        assert offs == [i * 256 for i in range(len(offs))]
