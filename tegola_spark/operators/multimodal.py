"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are opaque ``binary`` columns with a typed
metadata struct; decode / feature-extraction / resize / frame-sample
run as Arrow-batched ``mapInPandas`` stages. The decode kernels
themselves are STUBS in this environment (no PIL/ffmpeg/librosa in the
container — BASELINE round-1 instructions): ``decode_media`` sniffs
real magic bytes and computes deterministic fake features, and
``real_decode`` raises NotImplementedError where a production decoder
would plug in. The Spark-side plumbing — schema, batch iteration,
partition sizing — is real and tested.

Scale notes: payload columns must NEVER pass through a wide shuffle;
derive features early, project the payload away, and let the narrow
feature columns shuffle. ``decode_media`` is written as mapInPandas
(per-partition batch iterator) so payload bytes stream through Arrow
once.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = (
    "doc_id long, media_type string, payload_len long, "
    "width int, height int, n_frames int, feature array<float>"
)

_MAGIC = [
    (b"\x89PNG", "image/png"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"GIF8", "image/gif"),
    (b"RIFF", "audio/wav"),
    (b"\x00\x00\x00", "video/mp4"),  # ftyp boxes start with size
]


def sniff_media_type(payload: bytes) -> str:
    for magic, mt in _MAGIC:
        if payload[: len(magic)] == magic:
            return mt
    return "application/octet-stream"


def real_decode(payload: bytes, media_type: str):  # pragma: no cover
    """Production decoder hook (PIL / av / soundfile). Not available in
    this container — see module docstring."""
    raise NotImplementedError(
        "media decoding requires an image/audio library not present in "
        "this environment; decode_media uses the deterministic stub")


def _stub_features(payload: bytes, n: int = 8) -> np.ndarray:
    """Deterministic fake feature vector derived from payload bytes —
    stands in for an embedding so the downstream plumbing is real."""
    arr = np.frombuffer(payload[:1024], dtype=np.uint8).astype(np.float32)
    if len(arr) == 0:
        return np.zeros(n, dtype=np.float32)
    chunks = np.array_split(arr, n)
    return np.array([c.mean() if len(c) else 0.0 for c in chunks], dtype=np.float32)


def decode_media(df: DataFrame, payload_col: str = "payload",
                 id_col: str = "doc_id") -> DataFrame:
    """mapInPandas decode stage: sniff type, compute metadata + stub
    features; the payload column is PROJECTED AWAY in the output."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            ids = pdf[id_col]
            rows = []
            for i, b in zip(ids, payloads):
                b = bytes(b) if b is not None else b""
                mt = sniff_media_type(b)
                feat = _stub_features(b)
                # deterministic fake dims derived from content length
                w = 16 + (len(b) % 1024)
                h = 16 + (len(b) % 768)
                frames = 1 if mt.startswith("image") else 1 + (len(b) % 30)
                rows.append((int(i), mt, len(b), w, h, frames, feat.tolist()))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "media_type", "payload_len", "width", "height",
                "n_frames", "feature"])

    return df.mapInPandas(fn, MEDIA_SCHEMA)


def media_from_pages(pages: DataFrame) -> DataFrame:
    """Treat the html payload as the opaque media column (the corpus has
    no real images; the plumbing is identical)."""
    return pages.select("doc_id", F.col("html").alias("payload"))
