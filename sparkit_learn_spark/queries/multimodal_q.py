"""Driver-checkable multimodal decode queries.

The multimodal operators (operators/multimodal.py) were pytest-only
until round 5 — these queries give the component a real CORRECTNESS
row. The trick that makes header decoding SQL-oracle-able without the
oracle ever touching bytes: the blobs are SYNTHESIZED distributed
from fixture columns (doc_id, n_chars), so every decoded field is a
pure arithmetic function of those columns — the Spark side proves the
byte-build → struct-parse round trip (real PNG/GIF/BMP/WAV headers,
the same parsers production bytes would hit), while the DuckDB oracle
recomputes the expected metadata directly from the arithmetic.

Scale: blob synthesis + decode is one mapInPandas pass each (no
shuffle at all — the whole pipeline is embarrassingly parallel), which
is exactly the shape a real 100 TB media-decode pass has: decode cost
scales with bytes per partition, never with table width.
"""

from __future__ import annotations

import struct
import zlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

#: Byte sizes of the synthesized headers (constants by construction —
#: mirrored literally in the oracles).
PNG_BYTES = 33   # 8 sig + 4 len + 4 "IHDR" + 13 data + 4 crc
GIF_BYTES = 12   # 6 "GIF89a" + 4 dims + 2 (flags, bg)
BMP_BYTES = 26   # 2 "BM" + 16 header filler + 8 dims
WAV_BYTES = 44   # 12 RIFF/WAVE + 24 fmt chunk + 8 data chunk header


def _make_image_blob(doc_id: int, n_chars: int) -> bytes:
    """A REAL (minimal) image header: PNG/GIF/BMP cycled by doc_id%3,
    dimensions derived from the fixture columns."""
    w = 1 + n_chars % 640
    h = 1 + doc_id % 480
    kind = doc_id % 3
    if kind == 0:  # PNG: signature + IHDR chunk with a valid CRC
        ihdr = b"IHDR" + struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        return (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + ihdr
                + struct.pack(">I", zlib.crc32(ihdr) & 0xFFFFFFFF))
    if kind == 1:  # GIF: logical screen descriptor
        return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00\x00"
    # BMP: "BM" + filler up to the BITMAPINFOHEADER dims at offset 18
    return b"BM" + b"\x00" * 16 + struct.pack("<ii", w, h)


def _make_wav_blob(doc_id: int, n_chars: int) -> bytes:
    """A REAL RIFF/WAVE header: PCM fmt chunk + a data chunk whose
    declared size encodes n_chars frames (payload elided — frame count
    comes from the declared size, which is what the parser reads)."""
    rate = 8000 * (1 + doc_id % 3)
    channels = 1 + doc_id % 2
    bits = 16
    block = channels * (bits // 8)
    fmt = (b"fmt " + struct.pack("<I", 16)
           + struct.pack("<HHIIHH", 1, channels, rate, rate * block, block, bits))
    data_hdr = b"data" + struct.pack("<I", n_chars * block)
    body = b"WAVE" + fmt + data_hdr
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _blob_frame(docs: DataFrame, builder) -> DataFrame:
    """(item_id, data binary) synthesized distributed — blobs never
    exist on the driver."""
    import pandas as pd

    # the builder + downstream decoders are module-level functions,
    # pickled by reference — make the package importable on workers
    # whatever cwd the harness drives from
    from ..session import ensure_pkg_on_workers

    ensure_pkg_on_workers(docs.sparkSession)

    def build(batches):
        for pdf in batches:
            yield pd.DataFrame({
                "item_id": pdf["doc_id"],
                "data": [builder(int(i), int(c))
                         for i, c in zip(pdf["doc_id"], pdf["n_chars"])],
            })

    # r11 negative result (guide §1.1): spreading this scan to 32
    # partitions (catalog.spread_scan) made the sketch pipelines
    # SLOWER (q_mm_phash_neardup sketch 1.0 -> 1.7 s): each fresh
    # Python worker pays the package import, and 32 workers importing
    # for ~190 rows each dwarfs the single-core synth it parallelized.
    # JVM-side maps (md5/codegen) want the spread; tiny Python-stage
    # fan-outs do not.
    return docs.select("doc_id", "n_chars").mapInPandas(
        build, schema="item_id long, data binary"
    )


@register(
    "q_mm_decode",
    oracle=f"""
    SELECT doc_id AS item_id,
           CASE doc_id % 3 WHEN 0 THEN 'png'
                           WHEN 1 THEN 'gif'
                           ELSE 'bmp' END             AS format,
           CAST(1 + n_chars % 640 AS INT)             AS width,
           CAST(1 + doc_id % 480 AS INT)              AS height,
           CAST(CASE doc_id % 3 WHEN 0 THEN {PNG_BYTES}
                                WHEN 1 THEN {GIF_BYTES}
                                ELSE {BMP_BYTES} END AS BIGINT) AS n_bytes
    FROM documents
    """,
)
def q_mm_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image header decode over a synthesized binary column: real
    PNG/GIF/BMP header bytes built per row (distributed, from fixture
    columns), then struct-parsed back by the REAL pure-Python header
    decoder (operators/multimodal.parse_image_header — the same code
    path production PNG/GIF/BMP bytes hit). The oracle recomputes the
    expected dimensions from the generating arithmetic, closing the
    loop: any drift in either the byte layout or the parser breaks the
    hash."""
    from ..operators.multimodal import decode_images, header_image_decoder

    d = load_table(spark, sf_dir, "documents")
    decoded = decode_images(_blob_frame(d, _make_image_blob),
                            decoder=header_image_decoder())
    return decoded.select("item_id", "format", "width", "height", "n_bytes")


@register(
    "q_mm_decode_audio",
    oracle=f"""
    SELECT doc_id AS item_id,
           'wav_pcm'                                   AS format,
           CAST(8000 * (1 + doc_id % 3) AS INT)        AS sample_rate,
           CAST(1 + doc_id % 2 AS INT)                 AS channels,
           CAST(16 AS INT)                             AS bits_per_sample,
           CAST(n_chars AS BIGINT)                     AS n_frames,
           ROUND(CAST(n_chars AS DOUBLE)
                 / (8000 * (1 + doc_id % 3)), 6)       AS duration_s,
           CAST({WAV_BYTES} AS BIGINT)                 AS n_bytes
    FROM documents
    """,
)
def q_mm_decode_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WAV header decode over a synthesized binary column: real
    RIFF/WAVE fmt+data chunks built per row, walked back by the REAL
    chunk parser (operators/multimodal.parse_wav_header). Sample rate,
    channel count and frame count are arithmetic functions of the
    fixture columns, so the oracle checks the full byte round trip
    without decoding anything."""
    from ..operators.multimodal import decode_audio

    d = load_table(spark, sf_dir, "documents")
    decoded = decode_audio(_blob_frame(d, _make_wav_blob))
    return decoded.select(
        "item_id", "format", "sample_rate", "channels", "bits_per_sample",
        "n_frames", F.round("duration_s", 6).alias("duration_s"), "n_bytes",
    )


_FRAME_SIZE = 256
_VID_HEADER = 64


def _make_video_blob(doc_id: int, n_chars: int) -> bytes:
    """A minimal "video container": 64-byte header (magic + frame
    count + frame size) followed by n_frames fixed-size frames whose
    bytes derive from (doc_id, frame_no) — enough structure for the
    frame sampler to walk."""
    n_frames = 1 + (n_chars % 50)
    header = (b"VID0" + struct.pack("<II", n_frames, _FRAME_SIZE)
              ).ljust(_VID_HEADER, b"\x00")
    frames = b"".join(
        bytes([(doc_id + f) % 256]) * _FRAME_SIZE for f in range(n_frames)
    )
    return header + frames


@register(
    "q_mm_frame_sample",
    oracle=f"""
    SELECT doc_id AS item_id,
           CAST(i AS INT)                    AS frame_no,
           CAST(i * {_FRAME_SIZE} AS BIGINT) AS byte_offset
    FROM documents,
         unnest(range(0, 2 + (n_chars % 50))) AS u(i)
    """,
)
def q_mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling (STUB decode, REAL plumbing): synthesized
    container blobs (64B header + n fixed-size frames) walked by the
    fixed-stride frame sampler — the 1→N mapInPandas explode shape a
    real sampler has. Total blob length is 64 + n_frames·256, so
    stride-256 sampling yields n_frames+1 offsets (the header byte 0
    plus one per frame start) — the oracle recomputes exactly that
    from the generating arithmetic, value-checking the walk.

    Scale: zero-shuffle, embarrassingly parallel; output rows scale
    with sampled frames, not blob bytes."""
    from ..operators.multimodal import sample_frames

    d = load_table(spark, sf_dir, "documents")
    blobs = _blob_frame(d, _make_video_blob)
    return sample_frames(blobs, every_n_bytes=_FRAME_SIZE).select(
        "item_id", "frame_no", F.col("byte_offset").cast("long")
    )


@register(
    "q_mm_features",
    oracle="""
    SELECT CAST(16 AS INT) AS feature_dim,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_distinct
    FROM documents
    """,
)
def q_mm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary→embedding feature extraction (deterministic fake
    extractor behind the real mapInPandas plumbing): every synthesized
    image blob maps to a 16-dim vector; the query asserts the
    cardinality contract (one vector per item, fixed dim) in an
    oracle-checkable aggregate, while per-value determinism is pinned
    in tests/test_multimodal.py. The feature column itself feeds the
    similarity operators (cosine_topk / ann paths) — the multimodal →
    vector-search bridge."""
    from ..operators.multimodal import extract_features

    d = load_table(spark, sf_dir, "documents")
    blobs = _blob_frame(d, _make_image_blob)
    feats = extract_features(blobs, dim=16)
    return feats.groupBy(F.col("feature_dim").cast("int")).agg(
        F.count("*").alias("n_items"),
        F.countDistinct("item_id").alias("n_distinct"),
    ).select("feature_dim", "n_items", "n_distinct")
