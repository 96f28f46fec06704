"""Type/codec registry parity (reference python/scannerpy/types.py)."""

import numpy as np
import pytest

from scanner_spark import types as T


def test_registry_covers_reference_set():
    expect = {
        "bytes", "any", "ndarray_f32", "ndarray_i32",
        "variable_list", "bbox", "bbox_list", "histogram", "image",
    }
    assert expect <= set(T.registered_types())


def test_bytes_and_pickle_roundtrip():
    assert T.get_type("bytes").deserialize(T.get_type("bytes").serialize(b"xy")) == b"xy"
    obj = {"a": [1, 2], "b": ("z", 3.5)}
    t = T.get_type("any")
    assert t.deserialize(t.serialize(obj)) == obj


def test_ndarray_roundtrip():
    a = np.arange(6, dtype="float32")
    t = T.get_type("ndarray_f32")
    assert (t.deserialize(t.serialize(a)) == a).all()


def test_variable_list_roundtrip():
    items = [b"", b"a", b"longer payload"]
    t = T.get_type("variable_list")
    assert t.deserialize(t.serialize(items)) == items


def test_uniform_list_codec():
    t = T.uniform_list_codec(4)
    items = [b"aaaa", b"bbbb", b"cccc"]
    assert t.deserialize(t.serialize(items)) == items


def test_bbox_roundtrip():
    bb = T.Bbox(1.0, 2.0, 3.0, 4.0, 0.5, 7)  # f32-exact values
    t = T.get_type("bbox")
    assert t.deserialize(t.serialize(bb)) == bb
    tl = T.get_type("bbox_list")
    boxes = [bb, T.Bbox(0, 0, 1, 1)]
    assert tl.deserialize(tl.serialize(boxes)) == boxes


def test_histogram_roundtrip():
    h = np.arange(48, dtype="int32")
    t = T.get_type("histogram")
    assert (t.deserialize(t.serialize(h)) == h).all()


def test_image_encodes_png_and_decode_is_gated():
    img = np.zeros((4, 4, 3), dtype=np.uint8)
    t = T.get_type("image")
    assert t.serialize(img).startswith(b"\x89PNG")
    with pytest.raises(NotImplementedError):
        t.deserialize(b"\x89PNG...")


def test_events_ts_normalization_is_timezone_proof(spark, nonutc_spark, sf_dir):
    """unix_micros(events.ts) must be identical under a UTC session and a
    stock-inference America/New_York session — the round-3 hardening of
    the round-2 TIMESTAMP_NTZ regression (a plain NTZ->TIMESTAMP cast is
    session-tz-dependent; the wall-clock epoch arithmetic is not)."""
    from pyspark.sql import functions as F

    from scanner_spark.io import read_table

    def micros(sess):
        ev = read_table(sess, sf_dir, "events")
        return sorted(
            r.us for r in ev.select(F.unix_micros("ts").alias("us")).limit(100).collect()
        )

    assert micros(spark) == micros(nonutc_spark)
