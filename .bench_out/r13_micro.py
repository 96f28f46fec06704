#!/usr/bin/env python
"""Round-13 micro-bench: time a comma-separated query subset (arg2) at a
given sf dir (arg1), two passes, min. Mirrors bench.py's noop-sink timing."""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from scanner_spark.session import get_spark  # noqa: E402
from scanner_spark import queries as Q  # noqa: E402


def main():
    sf_dir = sys.argv[1]
    names = sys.argv[2].split(",")
    passes = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    spark = get_spark("r13-micro")
    spark.sparkContext.setLogLevel("ERROR")
    from scanner_spark.io import TABLES, read_table

    spark.range(1000).selectExpr("sum(id)").collect()
    for t in TABLES:
        read_table(spark, sf_dir, t).limit(1).collect()
    timings = {}
    for _p in range(passes):
        for name in names:
            t0 = time.monotonic()
            df = Q.QUERIES[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = round(time.monotonic() - t0, 3)
            timings.setdefault(name, []).append(dt)
            from scanner_spark.caching import release_all

            release_all()
            spark.catalog.clearCache()
    print(json.dumps({k: {"min": min(v), "all": v} for k, v in timings.items()}))
    spark.stop()


if __name__ == "__main__":
    main()
