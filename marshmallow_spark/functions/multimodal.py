"""Multimodal (image / video) column plumbing.

Audio is first-class in this engine (functions/audio.py — real G.711
decode + SNR). Image and video payloads follow the same pattern:
opaque ``binary`` columns + typed metadata, processed in Arrow-batched
``mapInPandas`` UDFs. The decode kernels themselves need codec
libraries that are NOT in this container, so they are STUBBED behind
``NotImplementedError`` with a deterministic fake — the Spark-side
plumbing (schemas, batch shapes, partitioning, UDF signatures) is real
and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

#: Canonical metadata schemas for multimodal tables.
IMAGE_SCHEMA = (
    "image_id string, bytes binary, width int, height int, channels int, format string"
)
VIDEO_SCHEMA = (
    "video_id string, bytes binary, fps double, n_frames int, codec string"
)

IMAGE_FEATURES_SCHEMA = "image_id string, feat array<float>, decode_ok boolean"
FRAME_SAMPLE_SCHEMA = "video_id string, frame_index int, frame_bytes binary"

#: Flip to True only in an environment with real codec libraries.
REAL_DECODERS_AVAILABLE = False


def _decode_image_real(payload: bytes, fmt: str) -> np.ndarray:  # pragma: no cover
    raise NotImplementedError(
        "image decode requires PIL/opencv which are not installed in this "
        "container; the deterministic fake below exercises the identical "
        "Spark plumbing"
    )


def _decode_image_fake(payload: bytes, width: int, height: int, channels: int) -> np.ndarray:
    """Deterministic stand-in decoder: byte histogram reshaped — stable
    across runs, cheap, and shape-faithful to a real decoder's output."""
    arr = np.frombuffer(payload or b"\x00", dtype=np.uint8)
    hist = np.bincount(arr, minlength=256).astype(np.float32)
    return hist / max(len(arr), 1)


def image_features(df: DataFrame, *, feat_dim: int = 256) -> DataFrame:
    """Batch feature extraction over an IMAGE_SCHEMA table.

    Arrow-batched mapInPandas: selects only the needed columns (the
    scan never reads unrelated metadata), one numpy pass per batch.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, oks = [], []
            for payload, w, h, c in zip(
                pdf["bytes"], pdf["width"], pdf["height"], pdf["channels"]
            ):
                if REAL_DECODERS_AVAILABLE:  # pragma: no cover
                    vec = _decode_image_real(payload, "png")[:feat_dim]
                    ok = True
                else:
                    vec = _decode_image_fake(payload, w, h, c)[:feat_dim]
                    ok = payload is not None
                feats.append(vec.tolist())
                oks.append(ok)
            yield pd.DataFrame(
                {"image_id": pdf["image_id"], "feat": feats, "decode_ok": oks}
            )

    return df.select("image_id", "bytes", "width", "height", "channels").mapInPandas(
        run, schema=IMAGE_FEATURES_SCHEMA
    )


def sample_frames(df: DataFrame, *, every_n: int = 10) -> DataFrame:
    """Frame sampling over a VIDEO_SCHEMA table: emits one row per
    sampled frame index. Real frame extraction is stubbed (no ffmpeg in
    the container); byte-range slicing stands in, preserving the
    one-to-many batch shape a real sampler produces."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for vid, payload, n_frames in zip(
                pdf["video_id"], pdf["bytes"], pdf["n_frames"]
            ):
                n = int(n_frames or 0)
                size = len(payload) if payload is not None else 0
                per = max(size // max(n, 1), 1)
                for fi in range(0, n, every_n):
                    ids.append(vid)
                    idxs.append(fi)
                    frames.append(payload[fi * per : (fi + 1) * per] if payload else b"")
            yield pd.DataFrame(
                {"video_id": ids, "frame_index": idxs, "frame_bytes": frames}
            )

    return df.select("video_id", "bytes", "n_frames").mapInPandas(
        run, schema=FRAME_SAMPLE_SCHEMA
    )
