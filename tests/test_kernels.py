"""Frame kernels over synthetic frame streams (reference kernels:
/root/reference/tests/test_ops.cpp; fixtures per FIXTURES.md)."""

import numpy as np
import pytest

from scanner_spark.frames import FRAME_SCHEMA, pack, synthetic_frame, unpack
from scanner_spark.kernels import histogram_op, image_encoder_op, optical_flow_op
from scanner_spark.kernels.image import encode_png, make_blur_op, make_resize_op

N_FRAMES = 6
H, W, C = 16, 20, 3


@pytest.fixture(scope="module")
def frame_stream(spark):
    rows = []
    for s in range(2):
        for i in range(N_FRAMES):
            r = pack(synthetic_frame(s, i, H, W, C))
            rows.append({"stream_id": str(s), "idx": i, **r})
    return spark.createDataFrame(
        rows, f"stream_id string, idx long, {FRAME_SCHEMA}"
    ).cache()


def test_histogram(frame_stream):
    out = histogram_op(
        frame_stream,
        ["frame", "height", "width", "channels", "dtype"],
        "hist",
        "array<array<long>>",
    )
    row = out.filter("stream_id = '0' and idx = 0").collect()[0]
    img = synthetic_frame(0, 0, H, W, C)
    for c in range(C):
        expect = np.histogram(img[:, :, c], bins=16, range=(0, 256))[0]
        assert row.hist[c] == expect.tolist()
        assert sum(row.hist[c]) == H * W


def test_resize(frame_stream):
    op = make_resize_op(8, 10)
    out = op(
        frame_stream,
        ["frame", "height", "width", "channels", "dtype"],
        "resized",
        f"struct<{FRAME_SCHEMA}>",
    )
    row = out.filter("stream_id = '0' and idx = 1").collect()[0]
    r = row.resized
    assert (r.height, r.width, r.channels) == (8, 10, C)
    img = unpack(r.frame, r.height, r.width, r.channels, r.dtype)
    src = synthetic_frame(0, 1, H, W, C)
    # nearest-neighbor: out[0,0] == src[0,0]
    assert (img[0, 0] == src[0, 0]).all()


def test_blur_constant_region(spark):
    # blur of a constant image is the same constant (edge-replicated pad)
    img = np.full((8, 8, 1), 77, dtype=np.uint8)
    df = spark.createDataFrame(
        [{"stream_id": "0", "idx": 0, **pack(img)}],
        f"stream_id string, idx long, {FRAME_SCHEMA}",
    )
    op = make_blur_op(3)
    out = op(
        df,
        ["frame", "height", "width", "channels", "dtype"],
        "blurred",
        f"struct<{FRAME_SCHEMA}>",
    )
    r = out.collect()[0].blurred
    assert unpack(r.frame, r.height, r.width, r.channels, r.dtype).min() == 77
    assert unpack(r.frame, r.height, r.width, r.channels, r.dtype).max() == 77


@pytest.fixture(scope="module")
def struct_frame_stream(spark, frame_stream):
    from pyspark.sql import functions as F

    return frame_stream.select(
        "stream_id",
        "idx",
        F.struct("frame", "height", "width", "channels", "dtype").alias("frame_struct"),
    ).cache()


def test_optical_flow(struct_frame_stream):
    out = optical_flow_op(
        struct_frame_stream, ["frame_struct"], "flow", f"struct<{FRAME_SCHEMA}>"
    )
    rows = {
        (r.stream_id, r.idx): r.flow
        for r in out.collect()
    }
    f0 = rows[("0", 0)]
    assert (f0.height, f0.width, f0.channels, f0.dtype) == (H, W, 2, "f32")
    # REPEAT_EDGE at stream head: flow(0) compares frame 0 with itself -> 0
    flow0 = unpack(f0.frame, H, W, 2, "f32")
    assert float(np.abs(flow0).max()) == 0.0
    # interior: x-flow = mean intensity delta between consecutive frames
    f1 = rows[("0", 1)]
    flow1 = unpack(f1.frame, H, W, 2, "f32")
    a = synthetic_frame(0, 0, H, W, C).astype(np.float32).mean(axis=2)
    b = synthetic_frame(0, 1, H, W, C).astype(np.float32).mean(axis=2)
    assert np.allclose(flow1[:, :, 0], b - a)


def test_png_encoder_roundtrip_header(frame_stream):
    out = image_encoder_op(
        frame_stream.limit(1),
        ["frame", "height", "width", "channels", "dtype"],
        "png",
        "binary",
    )
    png = bytes(out.collect()[0].png)
    assert png.startswith(b"\x89PNG\r\n\x1a\n")
    assert b"IHDR" in png and b"IEND" in png


def test_png_bytes_deterministic():
    img = synthetic_frame(0, 0, 4, 4, 3)
    assert encode_png(img) == encode_png(img)
