"""Round-15 post-chain watch-query adjudication (measurement only).

The r15 sf10 chain phase showed three upticks on UNTOUCHED code paths
(multimodal_audio 41.2 -> 53.4 s, emb_cosine_pairs 25.6 -> 40.4 s,
tpch_q5 6.2 -> 16.8 s) plus the standing stream_dedup_minhash_lsh
pacing watch item.  This probe times each in a FRESH session at sf10,
two reps, to separate suite-order / box-phase noise from a real cost
change.  git log over their code paths since r14 is empty, so any
delta here is environmental by construction.
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession

import scanner_spark.queries as Q

SF_DIR = "/root/repo/.bench_data/sf10"
WATCH = ["tpch_q5", "multimodal_audio", "emb_cosine_pairs",
         "stream_dedup_minhash_lsh"]

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.driver.memory", "96g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("WARN")

res = {}
for rep in range(2):
    for name in WATCH:
        t0 = time.time()
        n = Q.QUERIES[name](spark, SF_DIR).count()
        dt = round(time.time() - t0, 2)
        res.setdefault(name, []).append(dt)
        print(f"rep{rep} {name}: {dt}s rows={n}", flush=True)

print(json.dumps({"sf_dir": SF_DIR, "reps": res,
                  "min": {k: min(v) for k, v in res.items()}}, indent=1))
spark.stop()
