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
