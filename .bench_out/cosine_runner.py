"""Time emb_cosine_pairs at a given SF dir, min-of-2 noop passes.

Usage: python cosine_runner.py <repo_root> <sf_dir>
Prints one JSON line {"repo": ..., "pass1": s, "pass2": s, "min": s, "rows": n}.
Run as a subprocess so old/new trees never share a module cache.
"""
import json
import sys
import time

repo, sf_dir = sys.argv[1], sys.argv[2]
sys.path.insert(0, repo)

from scanner_spark import queries as Q  # noqa: E402
from scanner_spark.session import get_spark  # noqa: E402
from scanner_spark import caching  # noqa: E402

spark = get_spark("cosine-probe")
spark.sparkContext.setLogLevel("ERROR")
spark.range(10000).repartition(64).selectExpr("sum(id)").collect()


def one_pass():
    t0 = time.monotonic()
    df = Q.QUERIES["emb_cosine_pairs"](spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    dt = round(time.monotonic() - t0, 2)
    caching.release_all()
    return dt


import os  # noqa: E402

p1 = one_pass()
p2 = one_pass()
if os.environ.get("COSINE_SKIP_COUNT"):
    rows = -1
else:
    rows = Q.QUERIES["emb_cosine_pairs"](spark, sf_dir).count()
caching.release_all()
print(json.dumps({"repo": repo, "pass1": p1, "pass2": p2,
                  "min": min(p1, p2), "rows": rows}), flush=True)
spark.stop()
