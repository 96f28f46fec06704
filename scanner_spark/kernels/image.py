"""Frame kernels: histogram / resize / blur / optical flow / PNG encode.

numpy re-implementations of the reference's in-repo kernels
(/root/reference/tests/test_ops.cpp:13-338,
/root/reference/scanner/util/image_encoder.cpp:112-117).  OpenCV is not
available in this container; resize is nearest-neighbor, blur is a
separable box filter, and optical flow is a deterministic
intensity-difference surrogate for Farneback (clearly marked) — the Spark
plumbing (stencil windows, frame packing, Arrow batches) is the real thing.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from scanner_spark.frames import pack, unpack
from scanner_spark.ops import register_op

HIST_BINS = 16


@register_op(name="Histogram")
def histogram_op(frame: bytes, height: int, width: int, channels: int, dtype: str):
    """Per-channel 16-bin histogram (reference: tests/test_ops.cpp:13-56;
    Histogram type = 3 x int32 array, python/scannerpy/types.py:132).

    Output type: ``array<array<int>>`` (C x 16).
    """
    img = unpack(frame, height, width, channels, dtype)
    return [
        np.histogram(img[:, :, c], bins=HIST_BINS, range=(0, 256))[0]
        .astype("int64")
        .tolist()
        for c in range(img.shape[2])
    ]


def make_resize_op(new_h: int, new_w: int):
    """Resize kernel factory — per-stream (width, height) args in the
    reference (ResizeArgs, tests/test_ops.proto:8-14; kernel
    tests/test_ops.cpp:114-170).  Nearest-neighbor, numpy-only.

    Output type: frame struct (``scanner_spark.frames.FRAME_SCHEMA``).
    """

    @register_op(name="Resize")
    def resize_op(frame: bytes, height: int, width: int, channels: int, dtype: str):
        img = unpack(frame, height, width, channels, dtype)
        ys = (np.arange(new_h) * height // new_h).clip(0, height - 1)
        xs = (np.arange(new_w) * width // new_w).clip(0, width - 1)
        return pack(np.ascontiguousarray(img[ys][:, xs]))

    return resize_op


resize_op = make_resize_op  # factory alias


def make_blur_op(ksize: int = 3):
    """Box blur kernel factory (reference gaussian blur:
    tests/test_ops.cpp:239-310, args tests/test_ops.proto:3-6).

    Separable box filter with edge replication; output frame struct.
    """
    if ksize % 2 != 1:
        raise ValueError("ksize must be odd")
    r = ksize // 2

    @register_op(name="Blur")
    def blur_op(frame: bytes, height: int, width: int, channels: int, dtype: str):
        img = unpack(frame, height, width, channels, dtype).astype(np.float64)
        padded = np.pad(img, ((r, r), (r, r), (0, 0)), mode="edge")
        out = np.zeros_like(img)
        for dy in range(-r, r + 1):
            for dx in range(-r, r + 1):
                out += padded[r + dy : r + dy + img.shape[0], r + dx : r + dx + img.shape[1]]
        out /= ksize * ksize
        return pack(out.astype(np.uint8))

    return blur_op


blur_op = make_blur_op


@register_op(name="OpticalFlow", stencil=[-1, 0])
def optical_flow_op(frames: list):
    """Dense flow between stenciled frames [-1, 0] (reference:
    tests/test_ops.cpp:63-109, cv2.calcOpticalFlowFarneback).

    STUB NUMERICS: OpenCV is unavailable here, so this emits a
    deterministic surrogate (per-pixel temporal gradient as the x-flow and
    zero y-flow) with the exact output shape/type Farneback would produce
    (H x W x 2 float32).  The stencil plumbing — Window [-1, 0] with
    REPEAT_EDGE at the stream head — is real and tested.
    """
    prev_row, cur_row = frames[0], frames[1]
    prev = unpack(**_row_kwargs(prev_row)).astype(np.float32).mean(axis=2)
    cur = unpack(**_row_kwargs(cur_row)).astype(np.float32).mean(axis=2)
    flow = np.stack([cur - prev, np.zeros_like(cur)], axis=2)
    return pack(flow)


def _row_kwargs(row) -> dict:
    # stencil windows deliver whole frame-struct rows
    return {
        "buf": row["frame"],
        "height": row["height"],
        "width": row["width"],
        "channels": row["channels"],
        "dtype": row["dtype"],
    }


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray) -> bytes:
    """Dependency-free PNG encode (stdlib zlib) for u8 RGB/gray frames."""
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    color_type = {1: 0, 3: 2, 4: 6}[c]
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


@register_op(name="ImageEncoder")
def image_encoder_op(frame: bytes, height: int, width: int, channels: int, dtype: str):
    """frame -> PNG bytes (reference: image_encoder.cpp:112-117, used by
    Column.load() of video columns, python/scannerpy/column.py:231-245)."""
    img = unpack(frame, height, width, channels, dtype)
    if img.dtype != np.uint8:
        img = np.clip(img, 0, 255).astype(np.uint8)
    return encode_png(img)
