#!/usr/bin/env python
"""One fresh-session rep of the stream_dedup_minhash_lsh A/B.

argv: side ('old'|'new'), sf_dir.  'old' monkeypatches the module-level
``banded_minhash_rows`` back to the retired JVM HOF chain (kept in-tree as
``banded_minhash_rows_hof``), so both sides run THIS tree's harness and
differ only in the signature stage.  Prints one JSON line with min-of-2
noop-sink passes (the bench's timing policy).
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

side, sf_dir = sys.argv[1], sys.argv[2]

from scanner_spark.session import get_spark
import scanner_spark.streaming.dedup as sdd

if side == "old":
    sdd.banded_minhash_rows = sdd.banded_minhash_rows_hof

from scanner_spark import queries as Q
from scanner_spark.deploy import ship

spark = get_spark("lsh-ab")
spark.sparkContext.setLogLevel("ERROR")
ship(spark)
spark.range(1000).selectExpr("sum(id)").collect()

times = []
for _ in range(2):
    t0 = time.monotonic()
    df = Q.q_stream_dedup_minhash_lsh(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    times.append(round(time.monotonic() - t0, 2))
    from scanner_spark.caching import release_all

    release_all()
    spark.catalog.clearCache()
n = Q.q_stream_dedup_minhash_lsh(spark, sf_dir).count()
print(json.dumps({"side": side, "passes": times, "min": min(times), "rows": n}))
spark.stop()
