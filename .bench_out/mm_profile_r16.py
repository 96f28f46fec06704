"""Round-16 post-chain reconnaissance: after the JPEG entropy
vectorization, where does multimodal_decode's remaining time go?

1. Single-core per-format codec micro-bench on ONE representative 32x32
   payload each (enc + dec), ranking the six formats so round 17
   targets the real dominator instead of assuming JPEG still leads.
2. Spark wall split at sf10: encode-only (text_to_media + payload-length
   noop) vs full query (encode + sniff/decode + resize + checksum) —
   the difference is the decode-side share; both min-of-2.

Artifacts only — no product code changes.
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

out = {}

from scanner_spark.kernels.gif import decode_gif, encode_gif
from scanner_spark.kernels.image import decode_png, encode_png
from scanner_spark.kernels.jpeg import (decode_jpeg, encode_jpeg,
                                        encode_jpeg_progressive)
from scanner_spark.kernels.tiff import decode_tiff, encode_tiff
from scanner_spark.kernels.webp import decode_webp, encode_webp

raw = ("the quick brown fox jumps over the lazy dog " * 80).encode()
arr = np.frombuffer(raw[: 32 * 32 * 3], np.uint8).reshape(32, 32, 3).copy()


def t(f, *a, n=300):
    f(*a)
    t0 = time.perf_counter()
    for _ in range(n):
        f(*a)
    return round((time.perf_counter() - t0) / n * 1e3, 3)


codecs = {}
pays = {
    "png": encode_png(arr),
    "jpeg": encode_jpeg(arr, 85),
    "jpeg_prog": encode_jpeg_progressive(arr, 85),
    "gif": encode_gif(np.repeat(arr[:, :, :1], 3, 2)),  # <=256 colors
    "webp": encode_webp(arr),
    "tiff": encode_tiff(arr),
}
codecs["enc_ms"] = {
    "png": t(encode_png, arr),
    "jpeg": t(encode_jpeg, arr, 85),
    "jpeg_prog": t(encode_jpeg_progressive, arr, 85),
    "gif": t(encode_gif, np.repeat(arr[:, :, :1], 3, 2)),
    "webp": t(encode_webp, arr),
    "tiff": t(encode_tiff, arr),
}
codecs["dec_ms"] = {
    "png": t(decode_png, pays["png"]),
    "jpeg": t(decode_jpeg, pays["jpeg"]),
    "jpeg_prog": t(decode_jpeg, pays["jpeg_prog"]),
    "gif": t(decode_gif, pays["gif"]),
    "webp": t(decode_webp, pays["webp"]),
    "tiff": t(decode_tiff, pays["tiff"]),
}
# per-6-docs group cost: one payload of each format per 6 docs (the
# %6 dispatch in text_to_media), every payload decoded once
group = sum(codecs["enc_ms"].values()) - codecs["enc_ms"]["png"] * 0 \
    + sum(codecs["dec_ms"].values())
codecs["per_6_docs_ms"] = round(group, 2)
print(json.dumps(codecs, indent=1), flush=True)
out["codec_microbench"] = codecs

# --- Spark wall split at sf10 ---------------------------------------
from pyspark.sql import functions as F

import scanner_spark.queries as Q
from scanner_spark.functions import multimodal
from scanner_spark.io import read_table
from scanner_spark.session import get_spark

SF10 = "/root/repo/.bench_data/sf10"
spark = get_spark("mm-profile-r16")
spark.sparkContext.setLogLevel("ERROR")
spark.range(10000).repartition(64).selectExpr("sum(id)").collect()


def timed(df):
    t0 = time.monotonic()
    df.write.format("noop").mode("overwrite").save()
    return round(time.monotonic() - t0, 2)


def min2(make):
    return min(timed(make()), timed(make()))


def enc_only():
    d = read_table(spark, SF10, "documents")
    return multimodal.text_to_media(d, "text", 32, 32).select(
        "asset_id", F.length("payload").alias("n")
    )


sp = {
    "encode_only_min2_s": min2(enc_only),
    "full_query_min2_s": min2(lambda: Q.QUERIES["multimodal_decode"](spark, SF10)),
}
sp["decode_side_approx_s"] = round(sp["full_query_min2_s"]
                                   - sp["encode_only_min2_s"], 2)
print(json.dumps(sp), flush=True)
out["sf10_split"] = sp

with open("/root/repo/.bench_out/mm_profile_r16.json", "w") as f:
    json.dump(out, f, indent=1)
spark.stop()
