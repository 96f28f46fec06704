"""One fresh-session timing of declared queries from a given tree.

argv: repo_root query[,query...] sf_dir n_passes
Prints one JSON line: {"root": ..., "queries": {name: [passes...]}, "calib": sha/s}.
Timing matches bench.py: build + noop-sink write per pass, caches released
between passes.
"""
import hashlib
import json
import sys
import time

root, names, sf_dir, n_passes = sys.argv[1], sys.argv[2].split(","), sys.argv[3], int(sys.argv[4])
sys.path.insert(0, root)

from scanner_spark.session import get_spark
from scanner_spark.deploy import ship
from scanner_spark import queries as Q
from scanner_spark.caching import release_all


def calib() -> float:
    blob = b"x" * 64
    t0 = time.perf_counter()
    n = 0
    while time.perf_counter() - t0 < 0.5:
        for _ in range(2000):
            blob = hashlib.sha256(blob).digest()
        n += 2000
    return round(n / (time.perf_counter() - t0))


spark = get_spark("qtime")
spark.sparkContext.setLogLevel("ERROR")
ship(spark)
spark.range(1000).selectExpr("sum(id)").collect()

c0 = calib()
out = {}
for name in names:
    times = []
    for _ in range(n_passes):
        t0 = time.monotonic()
        df = Q.QUERIES[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        times.append(round(time.monotonic() - t0, 2))
        release_all()
        spark.catalog.clearCache()
    out[name] = times
c1 = calib()
print(json.dumps({"root": root, "queries": out, "calib": [c0, c1]}))
spark.stop()
