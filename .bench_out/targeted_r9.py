#!/usr/bin/env python
"""Round-9 targeted at-scale measurement of the three round-8 plan changes
(VERDICT r8 'do this' #3): doc_lm_familiarity (h60-hashed bigram shuffle
keys), doc_repeated_passages_winnowed (vs the exact oracle-only path), and
emb_knn_ivf (persisted build / pruned-serve split).

Usage: python targeted_r9.py <sf_dir> <q1,q2,...> [passes]
Prints one JSON line per query: name, per-pass seconds, min.
Methodology matches bench.py: warmed session, noop sink, min over passes —
except passes are reported individually (pass1 vs pass2 of emb_knn_ivf IS
the build/serve split).
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from scanner_spark.session import get_spark  # noqa: E402
from scanner_spark import queries as Q  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2].split(",")
    passes = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    spark = get_spark("scanner-spark-bench-r9")
    spark.sparkContext.setLogLevel("ERROR")
    from scanner_spark.io import TABLES, read_table

    spark.range(1000).selectExpr("sum(id)").collect()
    for t in TABLES:
        read_table(spark, sf_dir, t).limit(1).collect()
    import pandas as pd
    from pyspark.sql import functions as F

    @F.pandas_udf("long")
    def _noop(s: pd.Series) -> pd.Series:
        return s

    spark.range(10000).repartition(64).select(_noop("id")).write.format(
        "noop"
    ).mode("overwrite").save()

    for name in names:
        fn = Q.QUERIES[name]
        ts = []
        for _ in range(passes):
            t0 = time.monotonic()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            ts.append(round(time.monotonic() - t0, 2))
            from scanner_spark.caching import release_all

            release_all()
            spark.catalog.clearCache()
        print(json.dumps({"sf_dir": sf_dir, "query": name,
                          "passes": ts, "min": min(ts)}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
