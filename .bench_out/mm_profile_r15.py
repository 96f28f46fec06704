"""Round-15 post-chain reconnaissance: where do multimodal_decode's
42.6 s (sf10 chain) actually go?

Two measurements, no product code changes:
1. Spark wall split at sf10: encode-only (text_to_media + payload-length
   noop sink) vs the full query (encode + sniff/decode + resize +
   checksum) — the difference is the decode-side cost.
2. Single-core per-format codec micro-bench on ONE representative
   32x32 payload each (1000 reps encode, 1000 reps decode): ranks the
   six codecs so the next lever targets the dominant one rather than
   guessing.
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession, functions as F

import scanner_spark.queries as Q
from scanner_spark.functions import multimodal
from scanner_spark.io import read_table

SF_DIR = "/root/repo/.bench_data/sf10"

out = {}

# --- 2. single-core codec micro-bench (no Spark needed) -------------
from scanner_spark.kernels.gif import decode_gif, encode_gif
from scanner_spark.kernels.image import decode_png, encode_png
from scanner_spark.kernels.jpeg import (decode_jpeg, encode_jpeg,
                                        encode_jpeg_progressive)
from scanner_spark.kernels.tiff import decode_tiff, encode_tiff
from scanner_spark.kernels.webp import decode_webp, encode_webp

# representative payload content = text_to_media's tiled UTF-8 bytes
raw = ("the quick brown fox jumps over the lazy dog " * 80).encode()
need3, need1 = 32 * 32 * 3, 32 * 32
img3 = np.frombuffer(raw[:need3], dtype=np.uint8).reshape(32, 32, 3)
grey = np.frombuffer(raw[:need1], dtype=np.uint8)
img_gif = np.repeat(grey.reshape(32, 32, 1), 3, axis=2)

REPS = 1000


def bench(fn, *a, **k):
    t0 = time.perf_counter()
    for _ in range(REPS):
        fn(*a, **k)
    return round((time.perf_counter() - t0) / REPS * 1e6, 1)  # us/img


micro = {}
png = encode_png(img3)
micro["png"] = {"enc_us": bench(encode_png, img3),
                "dec_us": bench(decode_png, png)}
jb = encode_jpeg(img3, quality=85)
micro["jpeg_baseline"] = {"enc_us": bench(encode_jpeg, img3, quality=85),
                          "dec_us": bench(decode_jpeg, jb)}
jp = encode_jpeg_progressive(img3, quality=85)
micro["jpeg_progressive"] = {
    "enc_us": bench(encode_jpeg_progressive, img3, quality=85),
    "dec_us": bench(decode_jpeg, jp)}
gif = encode_gif(img_gif)
micro["gif"] = {"enc_us": bench(encode_gif, img_gif),
                "dec_us": bench(decode_gif, gif)}
wp = encode_webp(img3)
micro["webp"] = {"enc_us": bench(encode_webp, img3),
                 "dec_us": bench(decode_webp, wp)}
tf = encode_tiff(img3, compression="lzw", predictor=2)
micro["tiff"] = {
    "enc_us": bench(encode_tiff, img3, compression="lzw", predictor=2),
    "dec_us": bench(decode_tiff, tf)}
out["micro_us_per_32x32"] = micro
print(json.dumps(micro, indent=1), flush=True)

# --- 1. Spark wall split at sf10 -------------------------------------
spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.adaptive.enabled", "true")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("WARN")

for rep in range(2):
    d = read_table(spark, SF_DIR, "documents")
    t0 = time.time()
    media = multimodal.text_to_media(d, "text", 32, 32)
    media.select("asset_id", F.length("payload").alias("n")) \
        .write.format("noop").mode("overwrite").save()
    enc = round(time.time() - t0, 2)

    t0 = time.time()
    Q.QUERIES["multimodal_decode"](spark, SF_DIR) \
        .write.format("noop").mode("overwrite").save()
    full = round(time.time() - t0, 2)
    out.setdefault("spark_sf10", []).append(
        {"encode_only_s": enc, "full_query_s": full,
         "decode_side_s": round(full - enc, 2)})
    print(f"rep{rep}: encode-only {enc}s, full {full}s", flush=True)

print(json.dumps(out, indent=1))
spark.stop()
