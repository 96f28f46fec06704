"""Round-16 pre-chain probes (quiet box, before the frozen-HEAD sweep).

1. Lever evidence (VERDICT r15 #1/#2 done-criteria): interleaved
   same-box kernel micro-bench, r15 HEAD (5f6666e) vs this tree, on
   fixture-content payloads — the rigorous old-vs-new comparison (the
   query-level chain rows compare across rounds and carry box noise).
2. sf10 fresh-session isolated timings (min-of-2, noop sink) for the
   two codec queries plus frame_optical_flow (VERDICT #6: re-measure on
   a quiet box before treating its flat 17.2 s as a lever).
3. emb_cosine_pairs stage split at sf10 (VERDICT #7): prep stage
   (scan + sq_norm + hyperplane bucket + exact-dup collapse, the same
   expression shapes as functions/dedup.cosine_dup_pairs) vs the full
   query — names the dominant stage for round 17.

Usage: python .bench_out/probe_r16.py  (writes probe_r16.json here)
"""
import importlib.util
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

OUT = {}
HERE = os.path.dirname(os.path.abspath(__file__))
SF10 = "/root/repo/.bench_data/sf10"


def load(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


# --- 1. interleaved kernel micro-bench (old = r15 HEAD 5f6666e) -----
old_jpeg = load("/tmp/oldjpeg/old_jpeg.py", "old_jpeg")
old_flac = load("/tmp/oldflac/old_flac.py", "old_flac")
from scanner_spark.kernels import flac as new_flac  # noqa: E402
from scanner_spark.kernels import jpeg as new_jpeg  # noqa: E402

raw = ("the quick brown fox jumps over the lazy dog " * 80).encode()
arr = np.frombuffer(raw[: 32 * 32 * 3], np.uint8).reshape(32, 32, 3).copy()
pb = new_jpeg.encode_jpeg(arr, 85)
pp = new_jpeg.encode_jpeg_progressive(arr, 85)
did = 7
p = did % 50 + 2
n = 1000 + (did % 7) * 100
i = np.arange(n, dtype=np.int64)
clip = ((((i * p) % 256) - 128) * 64).astype(np.int16)
fpay = new_flac.encode_flac(clip, 16000)
assert old_jpeg.encode_jpeg(arr, 85) == pb, "old/new baseline payload diverges"
assert old_flac.encode_flac(clip, 16000) == fpay, "old/new flac payload diverges"

ops = {
    "jpeg_enc_base": (lambda m: m.encode_jpeg(arr, 85), old_jpeg, new_jpeg, 150),
    "jpeg_enc_prog": (lambda m: m.encode_jpeg_progressive(arr, 85),
                      old_jpeg, new_jpeg, 150),
    "jpeg_dec_base": (lambda m: m.decode_jpeg(pb), old_jpeg, new_jpeg, 150),
    "jpeg_dec_prog": (lambda m: m.decode_jpeg(pp), old_jpeg, new_jpeg, 150),
    "flac_enc": (lambda m: m.encode_flac(clip, 16000), old_flac, new_flac, 200),
    "flac_dec": (lambda m: m.decode_flac(fpay), old_flac, new_flac, 200),
}
kern = {}
for name, (f, om, nm, reps) in ops.items():
    f(om), f(nm)
    to = tn = 0.0
    for _ in range(reps):  # interleaved: identical phase noise both sides
        t0 = time.perf_counter()
        f(om)
        t1 = time.perf_counter()
        f(nm)
        t2 = time.perf_counter()
        to += t1 - t0
        tn += t2 - t1
    kern[name] = {"old_ms": round(to / reps * 1e3, 3),
                  "new_ms": round(tn / reps * 1e3, 3),
                  "speedup": round(to / tn, 2)}
    print(name, kern[name], flush=True)
OUT["kernel_interleaved_old=5f6666e"] = kern

# --- 2/3. Spark sf10 isolated timings ---------------------------------
from scanner_spark import queries as Q  # noqa: E402
from scanner_spark.io import read_table  # noqa: E402
from scanner_spark.session import get_spark  # noqa: E402

spark = get_spark("probe-r16")
spark.sparkContext.setLogLevel("ERROR")
import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

spark.range(10000).repartition(64).selectExpr("sum(id)").collect()


def timed(df):
    t0 = time.monotonic()
    df.write.format("noop").mode("overwrite").save()
    return round(time.monotonic() - t0, 2)


def min2(make):
    a = timed(make())
    b = timed(make())
    return {"pass1": a, "pass2": b, "min": min(a, b)}


sp = {}
for qname in ("multimodal_decode", "multimodal_audio", "frame_optical_flow"):
    sp[qname] = min2(lambda qname=qname: Q.QUERIES[qname](spark, SF10))
    print(qname, sp[qname], flush=True)
OUT["sf10_isolated"] = sp

# stage split for emb_cosine_pairs: prep = the same scan + sq_norm +
# hyperplane bucket + exact-dup collapse shapes the product path builds
# before its pair join (functions/dedup.cosine_dup_pairs)
from scanner_spark.functions import dedup  # noqa: E402
from scanner_spark.functions.simsearch import hyperplanes, lsh_bucket  # noqa: E402
from scanner_spark.queries import COSINE_THRESHOLD, EMB_LSH_BITS  # noqa: E402


def emb():
    return read_table(spark, SF10, "embeddings").withColumn(
        "embedding", F.transform(F.col("embedding"), lambda x: x.cast("double"))
    )


@F.pandas_udf("double")
def sq_norm(vs: pd.Series) -> pd.Series:
    A = np.stack(vs.to_numpy()).astype("float64")
    acc = np.zeros(len(A))
    for j in range(A.shape[1]):
        acc += A[:, j] * A[:, j]
    return pd.Series(acc)


def prep():
    e = emb()
    dim = int(e.select(F.size("embedding").alias("d")).first()["d"])
    planes = hyperplanes(dim, EMB_LSH_BITS)
    base = e.select(
        F.col("vec_id").alias("id"),
        F.col("embedding").alias("v"),
        sq_norm(F.col("embedding")).alias("n2"),
        F.col("label").alias("blk"),
        lsh_bucket(F.col("embedding"), planes).alias("__bucket"),
    )
    return base.groupBy("blk", "__bucket", "v", "n2").agg(
        F.min("id").alias("rid"), F.collect_list("id").alias("ids")
    )


cs = {"prep_stage": min2(prep),
      "full_query": min2(lambda: dedup.cosine_dup_pairs(
          emb(), threshold=COSINE_THRESHOLD, lsh_bits=EMB_LSH_BITS))}
cs["pair_stage_approx"] = round(
    cs["full_query"]["min"] - cs["prep_stage"]["min"], 2)
print("emb_cosine_pairs split:", cs, flush=True)
OUT["emb_cosine_pairs_sf10_split"] = cs

with open(os.path.join(HERE, "probe_r16.json"), "w") as f:
    json.dump(OUT, f, indent=1)
print(json.dumps(OUT))
spark.stop()
