"""SVF — a deterministic GOP-structured test container format.

This container stands in for H.264-in-mp4 (no ffmpeg/PyAV in this
environment) while keeping the property that makes video scheduling hard
and makes the reference's decode pruning worthwhile
(/root/reference/scanner/video/decoder_automata.cpp,
column_source.cpp:120-180): **frames can only be decoded forward from a
keyframe** — delta frames store byte-wise diffs against the previous frame,
so a decoder that enters mid-GOP produces garbage.  Tests therefore verify
the GOP-interval planner *functionally*: wrong pruning = wrong pixels.

Layout (little-endian):
  magic 'SVF1' | u16 height | u16 width | u16 channels | u16 gop
  then per frame: u32 frame_no | u8 is_key | u32 size | payload[size]
    keyframe payload  = raw frame bytes
    delta payload     = (frame - prev_frame) mod 256

Swapping SVF for real H.264 changes only parse_header/decode_gop — the
index schema, the pruning join, and the mapInPandas plumbing are
format-agnostic.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

MAGIC = b"SVF1"
FILE_HEADER = struct.Struct("<4sHHHH")
FRAME_HEADER = struct.Struct("<IBI")


def encode_svf(frames: list[np.ndarray], gop: int = 8) -> bytes:
    """Encode u8 frames into an SVF byte string (keyframe every ``gop``)."""
    h, w, c = frames[0].shape
    out = [FILE_HEADER.pack(MAGIC, h, w, c, gop)]
    prev = None
    for i, f in enumerate(frames):
        assert f.shape == (h, w, c) and f.dtype == np.uint8
        is_key = 1 if i % gop == 0 else 0
        payload = (f if is_key else (f.astype(np.int16) - prev).astype(np.uint8)).tobytes()
        out.append(FRAME_HEADER.pack(i, is_key, len(payload)))
        out.append(payload)
        prev = f.astype(np.int16)
    return b"".join(out)


@dataclass
class FrameIndexEntry:
    frame_no: int
    is_key: bool
    offset: int  # byte offset of the frame header within the file
    size: int  # header + payload bytes


def parse_index(buf: bytes) -> tuple[dict, list[FrameIndexEntry]]:
    """Demux-only pass: walk headers, never touch payloads — the analog of
    the reference's keyframe index built at ingest (ingest.cpp:310-365)."""
    magic, h, w, c, gop = FILE_HEADER.unpack_from(buf, 0)
    if magic != MAGIC:
        raise ValueError("not an SVF container")
    meta = {"height": h, "width": w, "channels": c, "gop": gop}
    entries = []
    off = FILE_HEADER.size
    while off < len(buf):
        frame_no, is_key, size = FRAME_HEADER.unpack_from(buf, off)
        entries.append(
            FrameIndexEntry(frame_no, bool(is_key), off, FRAME_HEADER.size + size)
        )
        off += FRAME_HEADER.size + size
    return meta, entries


def decode_range(
    buf: bytes, start_offset: int, meta: dict, wanted: set[int], base: int = 0
) -> dict[int, np.ndarray]:
    """Decode forward from the keyframe at ``start_offset`` until every
    wanted frame is produced; returns {frame_no: frame}.  Refuses to start
    on a non-keyframe (the property the pruning planner must respect).

    ``base``: absolute file offset of ``buf[0]`` — a GOP decode task hands
    in only its byte window (range read); ``start_offset`` stays the
    absolute keyframe offset from the index."""
    h, w, c = meta["height"], meta["width"], meta["channels"]
    out: dict[int, np.ndarray] = {}
    remaining = set(wanted)
    off = start_offset
    cur: np.ndarray | None = None
    while remaining and off - base < len(buf):
        frame_no, is_key, size = FRAME_HEADER.unpack_from(buf, off - base)
        payload = np.frombuffer(buf, dtype=np.uint8, count=size, offset=off - base + FRAME_HEADER.size)
        frame = payload.reshape(h, w, c)
        if cur is None:
            if not is_key:
                raise ValueError(
                    f"decode must start at a keyframe (offset {start_offset} is a delta frame)"
                )
            cur = frame.astype(np.int16)
        else:
            cur = (cur + frame.astype(np.int16)) % 256 if not is_key else frame.astype(np.int16)
        if frame_no in remaining:
            out[frame_no] = cur.astype(np.uint8)
            remaining.discard(frame_no)
        off += FRAME_HEADER.size + size
    if remaining:
        raise ValueError(f"frames not found in container: {sorted(remaining)[:5]}")
    return out
