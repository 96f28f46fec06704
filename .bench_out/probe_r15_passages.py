"""Round-15 probe: fused per-doc (fp, occ) pre-aggregate (new, one
shuffle) vs explode + groupBy(fp, doc) + groupBy(fp) (old, two shuffles)
for doc_repeated_passages (+ winnowed), interleaved, 2 reps, noop."""
import json
import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession, functions as F

from scanner_spark import queries
from scanner_spark.deploy import ship
from scanner_spark.functions import text
from scanner_spark.io import read_table
from scanner_spark.queries import PASSAGE_K, PASSAGE_W

sf_dir = sys.argv[1]
spark = (SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "100g")
    .config("spark.sql.adaptive.enabled", "true")
    .appName("probe_r15_passages").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
ship(spark)


def old_exact():
    d = read_table(spark, sf_dir, "documents")
    wroll = text.windowed_fingerprint_udf(PASSAGE_K)
    per_doc = (d.select("doc_id", F.explode(wroll(F.col("text"))).alias("fp"))
               .groupBy("fp", "doc_id").agg(F.count("*").alias("occ")))
    return (per_doc.groupBy("fp")
            .agg(F.count("*").alias("n_docs"), F.sum("occ").alias("n_occ"))
            .filter(F.col("n_docs") >= 2))


def old_winnowed():
    d = read_table(spark, sf_dir, "documents")
    wf = text.winnowed_fingerprint_udf(PASSAGE_K, PASSAGE_W)
    per_doc = (d.select("doc_id", F.explode(wf(F.col("text"))).alias("s"))
               .select(F.col("s.fp").alias("fp"), "doc_id")
               .groupBy("fp", "doc_id").agg(F.count("*").alias("occ")))
    return (per_doc.groupBy("fp")
            .agg(F.count("*").alias("n_docs"), F.sum("occ").alias("n_occ"))
            .filter(F.col("n_docs") >= 2))


CASES = {
    "exact": (old_exact, lambda: queries.QUERIES["doc_repeated_passages"](spark, sf_dir)),
    "winnowed": (old_winnowed, lambda: queries.QUERIES["doc_repeated_passages_winnowed"](spark, sf_dir)),
}

def run(df):
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0

run(CASES["winnowed"][1]())  # warm
res = {c: {"old": [], "new": []} for c in CASES}
for rep in range(2):
    for cname, (old_f, new_f) in CASES.items():
        for which, f in (("old", old_f), ("new", new_f)):
            dt = run(f())
            res[cname][which].append(round(dt, 2))
            print(f"rep{rep} {cname} {which}: {dt:.2f}s", flush=True)
print(json.dumps({c: {"old_min": min(v["old"]), "new_min": min(v["new"]),
                      "speedup": round(min(v["old"])/min(v["new"]), 2), "raw": v}
                  for c, v in res.items()}))
