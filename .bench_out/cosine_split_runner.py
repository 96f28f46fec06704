"""Stage-split probe for the round-16 cosine pair rewrite (new tree).

Times, at $1=sf_dir with the noop sink (fresh-session, two passes each):
  prep   — reps build (scan + sq_norm + bucket + exact-dup collapse)
  cand   — prep + per-bucket applyInPandas pair stage
  filt   — cand + JVM round/threshold filter + pair repartition
  full   — the declared query end-to-end
Prints one JSON line.  Usage: python cosine_split_runner.py <sf_dir>
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from scanner_spark import caching, queries as Q  # noqa: E402
from scanner_spark.functions import dedup  # noqa: E402
from scanner_spark.io import read_table  # noqa: E402
from scanner_spark.session import get_spark  # noqa: E402

sf_dir = sys.argv[1]
spark = get_spark("cosine-split")
spark.sparkContext.setLogLevel("ERROR")
spark.range(10000).repartition(64).selectExpr("sum(id)").collect()

OUT = {}


def timed(make, label):
    res = []
    for _ in range(2):
        t0 = time.monotonic()
        make().write.format("noop").mode("overwrite").save()
        res.append(round(time.monotonic() - t0, 2))
        caching.release_all()
    OUT[label] = {"pass1": res[0], "pass2": res[1], "min": min(res)}
    print(label, OUT[label], flush=True)


def embs():
    return read_table(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.transform(F.col("embedding"), lambda x: x.cast("double"))
    )


# internal stages, built by calling the product function and truncating
# its lazy plan via private access is not possible; instead rebuild the
# stages with the same public helpers the product path uses
from scanner_spark.functions.simsearch import hyperplanes, lsh_bucket  # noqa: E402


def build_reps():
    df = embs()
    dim = int(df.select(F.size("embedding").alias("d")).first()["d"])
    planes = hyperplanes(dim, Q.EMB_LSH_BITS)

    @F.pandas_udf("double")
    def sq_norm(vs: pd.Series) -> pd.Series:
        A = np.stack(vs.to_numpy()).astype("float64")
        n = np.zeros(len(A))
        for j in range(A.shape[1]):
            n += A[:, j] * A[:, j]
        return pd.Series(n)

    base = df.select(
        F.col("vec_id").alias("id"),
        F.col("embedding").alias("v"),
        sq_norm(F.col("embedding")).alias("n2"),
        F.col("label").alias("blk"),
        lsh_bucket(F.col("embedding"), planes).alias("__bucket"),
    )
    return base.groupBy("blk", "__bucket", "v", "n2").agg(
        F.min("id").alias("rid"), F.collect_list("id").alias("ids")
    )


def build_cand(reps):
    key_names = ["blk", "__bucket"]
    threshold = Q.COSINE_THRESHOLD
    pre_threshold = threshold - 1e-6

    def _bucket_pairs(pdf):
        m = len(pdf)
        if m < 2:
            return pd.DataFrame(
                {"rid_a": pd.Series([], dtype="int64"),
                 "rid_b": pd.Series([], dtype="int64"),
                 "dot": pd.Series([], dtype="float64"),
                 "n2a": pd.Series([], dtype="float64"),
                 "n2b": pd.Series([], dtype="float64")}
            )
        pdf = pdf.sort_values("rid")
        rid = pdf["rid"].to_numpy()
        n2 = pdf["n2"].to_numpy(dtype="float64")
        A = np.stack(pdf["v"].to_numpy()).astype("float64")
        sq = np.sqrt(n2)
        parts = []
        chunk = max(1, (8 << 20) // m)
        for s in range(0, m - 1, chunk):
            e = min(m, s + chunk)
            D = np.zeros((e - s, m))
            Ac = A[s:e]
            for j in range(A.shape[1]):
                D += np.multiply.outer(Ac[:, j], A[:, j])
            with np.errstate(divide="ignore", invalid="ignore"):
                pre = D / (sq[s:e, None] * sq[None, :])
            keep = (np.arange(m)[None, :] > np.arange(s, e)[:, None]) & (
                pre >= pre_threshold)
            ri, ci = np.nonzero(keep)
            parts.append((rid[s + ri], rid[ci], D[ri, ci], n2[s + ri], n2[ci]))
        cols = [np.concatenate(c) for c in zip(*parts)]
        return pd.DataFrame({"rid_a": cols[0], "rid_b": cols[1], "dot": cols[2],
                             "n2a": cols[3], "n2b": cols[4]})

    nparts = spark.sparkContext.defaultParallelism
    return (
        reps.na.drop(subset=key_names)
        .repartition(nparts, *key_names)
        .groupBy(*key_names)
        .applyInPandas(
            _bucket_pairs,
            "rid_a long, rid_b long, dot double, n2a double, n2b double")
    )


timed(build_reps, "prep_reps")
timed(lambda: build_cand(build_reps()), "cand")


def build_filt():
    nparts = spark.sparkContext.defaultParallelism
    return (
        build_cand(build_reps())
        .withColumn("cosine", F.round(
            F.col("dot") / (F.sqrt(F.col("n2a")) * F.sqrt(F.col("n2b"))), 6))
        .filter(F.col("cosine") >= Q.COSINE_THRESHOLD)
        .repartition(nparts, "rid_a", "rid_b")
    )


timed(build_filt, "filt")
timed(lambda: Q.QUERIES["emb_cosine_pairs"](spark, sf_dir), "full")
print(json.dumps(OUT), flush=True)
spark.stop()
