#!/usr/bin/env python
"""Round-17 probe: where does multimodal_decode's per-payload decode time go?

Reproduces the exact query-path payloads (text_to_media tiling, six formats
round-robin by doc_id % 6, 32x32, q=85) from real sf0.1 documents text, then
cProfiles the decode_payload loop (decode + bilinear resize to 16x16) —
the same work decode_image's mapInPandas does per batch.  Single process,
no Spark: this attributes CPU inside the kernel, not the plumbing.
"""
import cProfile
import io
import pstats
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import pyarrow.parquet as pq

from scanner_spark.kernels.gif import encode_gif
from scanner_spark.kernels.image import encode_png
from scanner_spark.kernels.jpeg import encode_jpeg_batch, encode_jpeg_progressive_batch
from scanner_spark.kernels.tiff import encode_tiff
from scanner_spark.kernels.webp import encode_webp
from scanner_spark.functions.multimodal import decode_payload

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 1200
h = w = 32
need3, need1 = h * w * 3, h * w

t = pq.read_table("/root/testdata/sf0.1/documents.parquet", columns=["doc_id", "text"])
ids = t["doc_id"].to_pylist()[:N_DOCS]
texts = t["text"].to_pylist()[:N_DOCS]


def tile(raw, need):
    reps = -(-need // len(raw))
    return np.frombuffer((raw * reps)[:need], dtype=np.uint8)


payloads = [None] * len(ids)
base_pos, base_arrs, prog_pos, prog_arrs = [], [], [], []
fmt = []
for i, (did, s) in enumerate(zip(ids, texts)):
    raw = (s or " ").encode("utf-8")
    k = int(did) % 6
    fmt.append(["png", "jpeg", "gif", "webp", "tiff", "jpeg_prog"][k])
    if k == 2:
        grey = tile(raw, need1)
        payloads[i] = encode_gif(np.repeat(grey.reshape(h, w, 1), 3, axis=2))
        continue
    arr = tile(raw, need3).reshape(h, w, 3)
    if k == 0:
        payloads[i] = encode_png(arr)
    elif k == 1:
        base_pos.append(i); base_arrs.append(arr)
    elif k == 3:
        payloads[i] = encode_webp(arr)
    elif k == 4:
        payloads[i] = encode_tiff(arr, compression="lzw", predictor=2)
    else:
        prog_pos.append(i); prog_arrs.append(arr)
for pos, p in zip(base_pos, encode_jpeg_batch(base_arrs, quality=85)):
    payloads[pos] = p
for pos, p in zip(prog_pos, encode_jpeg_progressive_batch(prog_arrs, quality=85)):
    payloads[pos] = p

# per-format wall timing (min of 3 passes)
per_fmt = {}
for f in ("png", "jpeg", "gif", "webp", "tiff", "jpeg_prog"):
    sel = [p for p, ff in zip(payloads, fmt) if ff == f]
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for p in sel:
            decode_payload(p, 16, 16)
        best = min(best, time.perf_counter() - t0)
    per_fmt[f] = {"n": len(sel), "sec": round(best, 4),
                  "ms_per": round(1e3 * best / max(1, len(sel)), 4)}

print("per-format decode (min of 3):")
for f, d in per_fmt.items():
    print(f"  {f:10s} n={d['n']:5d}  {d['sec']:8.3f} s  {d['ms_per']:7.4f} ms/img")
total = sum(d["sec"] for d in per_fmt.values())
print(f"  total {total:.3f} s for {len(payloads)} payloads")

pr = cProfile.Profile()
pr.enable()
for p in payloads:
    decode_payload(p, 16, 16)
pr.disable()
s = io.StringIO()
pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(45)
print(s.getvalue())
