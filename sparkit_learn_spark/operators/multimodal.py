"""Multimodal columns: images/audio/video as opaque ``binary`` columns
with typed metadata, processed through Arrow-batched mapInPandas.

The Spark-side plumbing (schema, partitioning, UDF signature, batch
shape) is real and tested; the actual media decoding is STUBBED —
the image/audio libraries are not in this container. Each decode
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
