"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Model (FIXTURES.md / SURVEY.md §1): a media element is a row
``(asset_id, media_type, payload: binary, meta: struct)``.  Decode and
feature extraction run as Arrow-batched ``mapInPandas`` so each Python
worker sees a columnar batch of blobs — the right shape for handing to an
image/audio library.

The decode *numerics* are STUBBED (this container ships no image/audio
codecs — no cv2/PIL/av): ``decode_image`` et al. produce a deterministic
fake derived from the payload bytes, clearly marked, behind the same
signatures a real libjpeg/ffmpeg path would use.  The Spark-side plumbing —
schema, batch iteration, partitioning, output contracts — is real and
tested; swapping in a real codec changes only the marked inner function.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from scanner_spark.frames import FRAME_SCHEMA

MEDIA_SCHEMA = (
    "asset_id long, media_type string, payload binary, "
    "meta struct<width:int, height:int, duration_ms:int, codec:string>"
)

_REAL_CODECS = False  # flip when cv2/PIL/av are installed


def _fake_decode(payload: bytes, h: int, w: int) -> np.ndarray:
    """DETERMINISTIC FAKE decode: pixels seeded from md5(payload).
    Stands in for cv2.imdecode until real codecs exist."""
    seed = int.from_bytes(hashlib.md5(payload or b"").digest()[:4], "big")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def decode_image(df: DataFrame, out_h: int = 32, out_w: int = 32) -> DataFrame:
    """payload binary -> decoded frame columns (mapInPandas, Arrow batches).

    Real-codec path raises until codecs are installed; fake path is
    deterministic so downstream plumbing is testable.
    """

    out_schema = f"asset_id long, {FRAME_SCHEMA}"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            frames = []
            for payload in pdf["payload"]:
                if _REAL_CODECS:
                    raise NotImplementedError("install cv2/PIL and implement real decode here")
                arr = _fake_decode(payload, out_h, out_w)
                frames.append(arr.tobytes())
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "frame": frames,
                    "height": out_h,
                    "width": out_w,
                    "channels": 3,
                    "dtype": "u8",
                }
            )

    return df.mapInPandas(run, schema=out_schema)


def extract_features(df: DataFrame, dim: int = 16) -> DataFrame:
    """payload binary -> feature vector (array<float>).

    DETERMINISTIC FAKE featurizer (md5-seeded); the mapInPandas batch
    contract matches what a real CLIP/CNN embedding job needs.
    """
    out_schema = "asset_id long, features array<float>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                seed = int.from_bytes(hashlib.md5(payload or b"").digest()[:4], "big")
                rng = np.random.default_rng(seed)
                feats.append(rng.random(dim).astype("float32").tolist())
            yield pd.DataFrame({"asset_id": pdf["asset_id"], "features": feats})

    return df.mapInPandas(run, schema=out_schema)


def sample_video_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """video payload -> sampled frame rows (one output row per sampled
    timestamp — a 1:N mapInPandas, the cardinality shape video decode
    needs).  Frame *content* is the deterministic fake; the frame-count
    arithmetic uses real metadata (duration_ms)."""
    out_schema = f"asset_id long, frame_no long, pts_ms long, {FRAME_SCHEMA}"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("asset_id", "frame_no", "pts_ms", "frame", "height", "width", "channels", "dtype")}
            for _, row in pdf.iterrows():
                dur = int(row["meta"]["duration_ms"] or 0)
                n = max(1, dur // every_ms)
                for i in range(n):
                    arr = _fake_decode((row["payload"] or b"") + i.to_bytes(4, "big"), 16, 16)
                    rows["asset_id"].append(row["asset_id"])
                    rows["frame_no"].append(i)
                    rows["pts_ms"].append(i * every_ms)
                    rows["frame"].append(arr.tobytes())
                    rows["height"].append(16)
                    rows["width"].append(16)
                    rows["channels"].append(3)
                    rows["dtype"].append("u8")
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, schema=out_schema)


def synthetic_media(spark, n: int = 8) -> DataFrame:
    """Deterministic media table for tests (payload = seeded bytes)."""
    rows = []
    for i in range(n):
        rows.append(
            {
                "asset_id": i,
                "media_type": ["image", "video", "audio"][i % 3],
                "payload": hashlib.sha256(str(i).encode()).digest() * 8,
                "meta": {"width": 64, "height": 48, "duration_ms": 3500 + 500 * i, "codec": "fake"},
            }
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
