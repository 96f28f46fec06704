#!/usr/bin/env python
"""Round-17 attribution (VERDICT r16 next-round #6): where do
dedup_minhash_clusters (14.8 s sf10 r16) and dedup_keep_best (16.2 s) go —
pair generation, the CC stage, or the cluster summary / argmax window?

Stages timed in ONE session (noop sink, min-of-2 each, caches released
between):
  pairs_only     — minhash_lsh_pairs(d)                (shared prefix)
  clusters_full  — dedup_clusters(pairs)               (declared query)
  keep_best_full — quality + dedup_keep_best(...)      (declared query)
Plus the CC path actually taken: edge count vs LOCAL_CC_MAX_EDGES.
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.bench_data/sf10"
HERE = os.path.dirname(os.path.abspath(__file__))

from pyspark.sql import functions as F  # noqa: E402

from scanner_spark.session import get_spark  # noqa: E402
from scanner_spark.deploy import ship  # noqa: E402
from scanner_spark.io import read_table  # noqa: E402
from scanner_spark.functions import dedup, text  # noqa: E402
from scanner_spark import queries as Q  # noqa: E402
from scanner_spark.caching import release_all  # noqa: E402

spark = get_spark("cc-probe")
spark.sparkContext.setLogLevel("ERROR")
ship(spark)
spark.range(1000).selectExpr("sum(id)").collect()

out = {}


def timeit(name, make):
    best = float("inf")
    for _ in range(2):
        t0 = time.monotonic()
        make().write.format("noop").mode("overwrite").save()
        best = min(best, round(time.monotonic() - t0, 2))
        release_all()
        spark.catalog.clearCache()
    out[name] = best
    print(name, best, flush=True)


d = read_table(spark, SF, "documents")
timeit("pairs_only", lambda: dedup.minhash_lsh_pairs(d, threshold=Q.MINHASH_THRESHOLD))
timeit("clusters_full", lambda: Q.q_dedup_minhash_clusters(spark, SF))
timeit("keep_best_full", lambda: Q.q_dedup_keep_best(spark, SF))

# which CC tier runs: the edge count the local-finish gate sees
pairs = dedup.minhash_lsh_pairs(d, threshold=Q.MINHASH_THRESHOLD)
n_edges = (
    pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
    .filter(F.col("u") != F.col("v"))
    .count()
)
out["n_edges"] = n_edges
out["local_cc_max_edges"] = dedup.LOCAL_CC_MAX_EDGES
out["cc_path"] = "local_union_find" if n_edges <= dedup.LOCAL_CC_MAX_EDGES else "distributed_rounds"
print(json.dumps(out))
with open(os.path.join(HERE, "cc_probe_r17.json"), "w") as f:
    json.dump({"sf_dir": SF, "timings_s": out}, f, indent=1)
spark.stop()
