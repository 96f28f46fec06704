"""Round-15 isolated probe: batched elementwise image kernels (new) vs the
round-14 per-row scalar kernels (old), interleaved, min of 2 reps, noop
writes (bench.py's evaluation discipline).  Usage:
    python .bench_out/probe_r15_imgbatch.py /root/repo/.bench_data/sf10
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession

from scanner_spark.frames import pack, unpack
from scanner_spark.kernels.image import (
    encode_png,
    gaussian_kernel_1d,
    histogram_frame,
    resize_bilinear,
    _sep_filter,
)
from scanner_spark.ops import register_op

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "100g")
    .config("spark.sql.adaptive.enabled", "true")
    .appName("probe_r15_imgbatch")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

# ---- round-14 scalar kernels, re-registered verbatim ----------------------

old_hist = register_op(name="HistogramOld")(
    lambda frame, h, w, c, dt: histogram_frame(unpack(frame, h, w, c, dt))
)


def old_make_resize_op(nh, nw):
    @register_op(name="ResizeOld")
    def op(frame, h, w, c, dt):
        return pack(np.ascontiguousarray(resize_bilinear(unpack(frame, h, w, c, dt), nh, nw)))

    return op


def old_make_blur_op(ksize):
    taps = gaussian_kernel_1d(ksize)

    @register_op(name="BlurOld")
    def op(frame, h, w, c, dt):
        img = unpack(frame, h, w, c, dt)
        out = _sep_filter(img.astype(np.float64), taps, "reflect101")
        if img.dtype == np.uint8:
            out = np.floor(out + 0.5).clip(0, 255).astype(np.uint8)
        else:
            out = out.astype(img.dtype)
        return pack(out)

    return op


def old_png(frame, h, w, c, dt):
    img = unpack(frame, h, w, c, dt)
    if img.dtype != np.uint8:
        img = np.clip(img, 0, 255).astype(np.uint8)
    return encode_png(img)


old_encoder = register_op(name="ImageEncoderOld")(old_png)

# ---- monkeypatch harness ----------------------------------------------------

from scanner_spark.kernels import image as image_mod
from scanner_spark import queries

NEW = (
    image_mod.histogram_op,
    image_mod.make_resize_op,
    image_mod.make_blur_op,
    image_mod.image_encoder_op,
)
OLD = (old_hist, lambda nh, nw: old_make_resize_op(nh, nw), old_make_blur_op, old_encoder)


def set_kernels(which):
    h, r, b, e = NEW if which == "new" else OLD
    image_mod.histogram_op = h
    image_mod.make_resize_op = r
    image_mod.make_blur_op = b
    image_mod.image_encoder_op = e


QS = ["frame_histogram", "frame_resize", "frame_blur", "frame_encode_png"]


def run_one(name):
    t0 = time.time()
    queries.QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.time() - t0


results = {q: {"old": [], "new": []} for q in QS}
# warm the session plan/codegen path once on a cheap query
set_kernels("new")
run_one("frame_resize")

for rep in range(2):
    for q in QS:
        for which in ("old", "new"):
            set_kernels(which)
            dt = run_one(q)
            results[q][which].append(round(dt, 2))
            print(f"rep{rep} {q} {which}: {dt:.2f}s", flush=True)

summary = {
    q: {
        "old_min": min(v["old"]),
        "new_min": min(v["new"]),
        "speedup": round(min(v["old"]) / min(v["new"]), 2),
        "raw": v,
    }
    for q, v in results.items()
}
print(json.dumps({"sf_dir": sf_dir, "queries": summary}, indent=1))
