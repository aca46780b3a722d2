"""Multimodal columns: images/audio/video as opaque ``binary`` columns
with typed metadata, processed through Arrow-batched mapInPandas.

The Spark-side plumbing (schema, partitioning, UDF signature, batch
shape) is real and tested. HEADER decoding is REAL and pure-Python —
``header_image_decoder`` struct-parses PNG/JPEG/GIF/BMP dimensions,
``wav_audio_decoder`` parses RIFF/WAVE fmt+data chunks — no imaging
library needed. Full PIXEL/SAMPLE decoding stays stubbed (the
image/audio libraries are not in this container). Each decode
function accepts a ``decoder`` callable; the default:

  * raises NotImplementedError when ``strict=True`` (production mode
    marker), or
  * produces a DETERMINISTIC FAKE decode derived from the bytes
    (length/checksum-based metadata) so the distributed pipeline
    around it is fully testable.

Swap in a real decoder (PIL / torchaudio / pyav) by passing
``decoder=`` — the Spark plumbing is unchanged.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame

#: Output schema of decode_images — typed metadata beside the blob.
IMAGE_META_SCHEMA = (
    "item_id long, n_bytes long, format string, width int, height int, checksum string"
)

FEATURE_SCHEMA = "item_id long, feature array<float>, feature_dim int"


def _fake_image_decode(blob: bytes) -> dict:
    """STUB decoder — deterministic fake metadata from the bytes.
    Replace with a real image decode (PIL.Image.open) in production."""
    crc = zlib.crc32(blob)
    return {
        "n_bytes": len(blob),
        "format": ["png", "jpeg", "webp"][crc % 3],
        "width": 64 + (crc % 1024),
        "height": 64 + ((crc >> 10) % 1024),
        "checksum": hashlib.sha256(blob).hexdigest()[:16],
    }


def _fake_feature_extract(blob: bytes, dim: int = 16) -> list[float]:
    """STUB feature extractor — deterministic pseudo-embedding from a
    sha256 expansion of the bytes. Replace with a real vision/audio
    encoder in production."""
    out: list[float] = []
    seed = blob
    while len(out) < dim:
        seed = hashlib.sha256(seed).digest()
        out.extend(b / 255.0 for b in seed)
    return out[:dim]


def parse_image_header(blob: bytes) -> dict:
    """REAL pure-Python image metadata: struct-parse the header of
    PNG (IHDR), JPEG (SOFn scan), GIF (logical screen descriptor) or
    BMP (BITMAPINFOHEADER) bytes — width/height without any imaging
    library. Raises ValueError on unrecognized or truncated bytes."""
    if blob[:8] == b"\x89PNG\r\n\x1a\n":
        # 8-byte signature, 4-byte length, b"IHDR", then W/H big-endian
        if blob[12:16] != b"IHDR" or len(blob) < 24:
            raise ValueError("truncated PNG: no IHDR chunk")
        w, h = struct.unpack(">II", blob[16:24])
        fmt = "png"
    elif blob[:3] == b"\xff\xd8\xff":
        # walk JPEG segments to the first SOFn frame header
        i, w, h = 2, None, None
        while i + 9 < len(blob):
            if blob[i] != 0xFF:
                i += 1
                continue
            marker = blob[i + 1]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = struct.unpack(">HH", blob[i + 5:i + 9])
                break
            seg_len = struct.unpack(">H", blob[i + 2:i + 4])[0]
            i += 2 + seg_len
        if w is None:
            raise ValueError("no SOF frame header found in JPEG")
        fmt = "jpeg"
    elif blob[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", blob[6:10])
        fmt = "gif"
    elif blob[:2] == b"BM" and len(blob) >= 26:
        w, h = struct.unpack("<ii", blob[18:26])
        h = abs(h)  # negative height = top-down DIB
        fmt = "bmp"
    else:
        raise ValueError("unrecognized image format (not PNG/JPEG/GIF/BMP)")
    return {
        "n_bytes": len(blob),
        "format": fmt,
        "width": int(w),
        "height": int(h),
        "checksum": hashlib.sha256(blob).hexdigest()[:16],
    }


def header_image_decoder() -> Callable[[bytes], dict]:
    """The REAL in-container ``decoder=`` for :func:`decode_images`:
    header struct-parsing only (see parse_image_header) — exact
    dimensions/format, no pixel decode, no third-party imports."""
    return parse_image_header


#: Output schema of decode_audio — parsed WAV metadata.
AUDIO_META_SCHEMA = (
    "item_id long, n_bytes long, format string, sample_rate int, "
    "channels int, bits_per_sample int, n_frames long, duration_s double"
)


def parse_wav_header(blob: bytes) -> dict:
    """REAL pure-Python WAV metadata: walk the RIFF chunk list for
    ``fmt `` (sample rate / channels / bit depth) and ``data`` (frame
    count). Raises ValueError on non-RIFF/WAVE bytes."""
    if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    i, meta, data_size = 12, None, None
    while i + 8 <= len(blob):
        cid, size = blob[i:i + 4], struct.unpack("<I", blob[i + 4:i + 8])[0]
        if cid == b"fmt ":
            audio_fmt, channels, rate = struct.unpack("<HHI", blob[i + 8:i + 16])
            bits = struct.unpack("<H", blob[i + 22:i + 24])[0]
            meta = (audio_fmt, channels, rate, bits)
        elif cid == b"data":
            data_size = size
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if meta is None:
        raise ValueError("no fmt chunk in WAVE stream")
    audio_fmt, channels, rate, bits = meta
    block_align = max(1, channels * (bits // 8))
    n_frames = (data_size // block_align) if data_size is not None else 0
    return {
        "n_bytes": len(blob),
        "format": "wav_pcm" if audio_fmt == 1 else f"wav_fmt{audio_fmt}",
        "sample_rate": int(rate),
        "channels": int(channels),
        "bits_per_sample": int(bits),
        "n_frames": int(n_frames),
        "duration_s": (n_frames / rate) if rate else 0.0,
    }


def decode_audio(df: DataFrame, *, id_col: str = "item_id",
                 binary_col: str = "data",
                 decoder: Callable[[bytes], dict] | None = None) -> DataFrame:
    """binary column -> typed audio metadata (AUDIO_META_SCHEMA) via
    Arrow-batched mapInPandas; the default decoder is the REAL WAV
    header parser (sample decode — resample/spectrogram — would plug
    in as ``decoder=`` with a wider schema)."""
    dec = decoder or parse_wav_header

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [dec(bytes(b)) for b in pdf[binary_col]]
            out = pd.DataFrame(metas)
            out.insert(0, "item_id", pdf[id_col].to_numpy())
            yield out

    return df.select(id_col, binary_col).mapInPandas(run, schema=AUDIO_META_SCHEMA)


def pil_image_decoder() -> Callable[[bytes], dict]:
    """REAL image decoder built on PIL (Pillow), matching
    IMAGE_META_SCHEMA — the production ``decoder=`` for
    :func:`decode_images`. Raises ImportError where Pillow is absent
    (this container does not ship it; tests importorskip)."""
    import io

    from PIL import Image  # ImportError here = not available, by design

    def dec(blob: bytes) -> dict:
        with Image.open(io.BytesIO(blob)) as im:
            return {
                "n_bytes": len(blob),
                "format": (im.format or "unknown").lower(),
                "width": im.width,
                "height": im.height,
                "checksum": hashlib.sha256(blob).hexdigest()[:16],
            }

    return dec


def decode_images(df: DataFrame, *, id_col: str = "item_id",
                  binary_col: str = "data",
                  decoder: Callable[[bytes], dict] | None = None,
                  strict: bool = False) -> DataFrame:
    """binary column -> typed image metadata via Arrow-batched
    mapInPandas (iterator of pandas batches — bounded memory per task
    regardless of table size; blobs never pass through the driver)."""
    if strict and decoder is None:
        raise NotImplementedError(
            "STUB: no real image decoder available in this environment; "
            "pass decoder= (e.g. PIL-based) or use strict=False for the "
            "deterministic fake decode"
        )
    dec = decoder or _fake_image_decode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [dec(bytes(b)) for b in pdf[binary_col]]
            out = pd.DataFrame(metas)
            out.insert(0, "item_id", pdf[id_col].to_numpy())
            yield out

    return df.select(id_col, binary_col).mapInPandas(run, schema=IMAGE_META_SCHEMA)


def extract_features(df: DataFrame, *, id_col: str = "item_id",
                     binary_col: str = "data", dim: int = 16,
                     extractor: Callable[[bytes], list[float]] | None = None) -> DataFrame:
    """binary column -> fixed-dim feature vector (array<float>),
    ready for the similarity operators (cosine_topk / ann_lsh)."""
    ext = extractor or (lambda b: _fake_feature_extract(b, dim))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [ext(bytes(b)) for b in pdf[binary_col]]
            yield pd.DataFrame(
                {
                    "item_id": pdf[id_col].to_numpy(),
                    "feature": feats,
                    "feature_dim": [len(f) for f in feats],
                }
            )

    return df.select(id_col, binary_col).mapInPandas(run, schema=FEATURE_SCHEMA)


def sample_frames(df: DataFrame, *, id_col: str = "item_id",
                  binary_col: str = "data", every_n_bytes: int = 1024) -> DataFrame:
    """STUB of video frame sampling: emits one row per sampled "frame"
    (fixed-stride byte offsets stand in for frame decode). Shows the
    1->N explode shape a real frame sampler needs (mapInPandas can
    yield more rows than its input batch)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, offsets, frames = [], [], []
            for iid, blob in zip(pdf[id_col], pdf[binary_col]):
                blob = bytes(blob)
                for fno, off in enumerate(range(0, len(blob), every_n_bytes)):
                    ids.append(iid)
                    offsets.append(off)
                    frames.append(fno)
            yield pd.DataFrame({"item_id": ids, "frame_no": frames, "byte_offset": offsets})

    return df.select(id_col, binary_col).mapInPandas(
        run, schema="item_id long, frame_no int, byte_offset long"
    )


def dhash64(df: DataFrame, *, id_col: str = "item_id",
            binary_col: str = "data") -> DataFrame:
    """64-bit difference hash (dHash) — the standard perceptual hash
    for image near-duplicate detection: downsample to an 8x9 grayscale
    grid, bit (r, c) = 1 iff pixel (r, c) > pixel (r, c+1). Small
    visual edits flip few comparisons, so near-duplicate images land
    within a small Hamming distance.

    Real decoders reduce pixels to the 8x9 grid; here the first 72
    bytes of the blob ARE the grid (the deterministic-fake seam every
    multimodal operator in this module uses) — the hash math, batch
    shape, and downstream band-join are the production ones.

    Scale: one Arrow-batched mapInPandas pass, no shuffle; vectorized
    numpy packs the 64 comparison bits per image.
    """
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        weights = (np.uint64(1) << np.arange(64, dtype=np.uint64))
        for pdf in batches:
            hs = []
            for blob in pdf[binary_col]:
                grid = np.frombuffer(
                    bytes(blob)[:72].ljust(72, b"\0"), dtype=np.uint8
                ).reshape(8, 9)
                bits = (grid[:, :-1] > grid[:, 1:]).flatten()
                hs.append(int((weights * bits).sum(dtype=np.uint64)
                              .astype(np.int64)))
            yield pd.DataFrame({"item_id": pdf[id_col].to_numpy(),
                                "dhash": hs})

    return df.select(id_col, binary_col).mapInPandas(
        run, schema="item_id long, dhash long"
    )
