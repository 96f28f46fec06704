#!/usr/bin/env python
"""Round-13 tfidf re-plan experiment: time plan variants at a given sf dir.

Variants:
  A current  — groupBy(doc,term) tf, df via window over term, rank window
  B rle_join — in-row run-length (term,tf) pairs, df agg + join (AQE may
               broadcast), rank window
  C rle_win  — in-row run-length pairs, df via window over term, rank window
  D agg_join — groupBy tf, df agg + plain join, rank window (pre-r13 shape)
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import Window, functions as F  # noqa: E402

from scanner_spark.session import get_spark  # noqa: E402
from scanner_spark.io import read_table  # noqa: E402
from scanner_spark.functions import relevance  # noqa: E402


def rle_pairs(df):
    """(doc, term, tf) via in-row sort + run-length over the tokens array —
    no (doc,term) groupBy shuffle; Generate emits one row per DISTINCT term
    per doc instead of one per token."""
    return (
        df.selectExpr(
            "doc_id AS doc",
            r"array_sort(filter(split(lower(trim(text)), '\\s+'), x -> x <> '')) AS srt",
        )
        .selectExpr(
            "doc",
            "srt",
            "filter(sequence(0, size(srt) - 1), i -> i = 0 OR srt[i] <> srt[i-1]) AS starts",
        )
        .selectExpr(
            "doc",
            "explode(transform(starts, (s, j) -> struct("
            "  srt[s] AS term,"
            "  (if(j = size(starts) - 1, size(srt), starts[j+1]) - s) AS tf"
            "))) AS p",
        )
        .select("doc", "p.term", F.col("p.tf").cast("long").alias("tf"))
    )


def variant_a(spark, sf_dir):
    return relevance.tfidf_topk(read_table(spark, sf_dir, "documents"), k=3)


def _rank(scored, k=3):
    w = Window.partitionBy("doc").orderBy(F.col("score").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc", "term", "tf", "df_count", "score", "rank")
    )


def variant_b(spark, sf_dir):
    tf = rle_pairs(read_table(spark, sf_dir, "documents"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_count"))
    scored = tf.join(dfreq, "term").withColumn(
        "score", F.col("tf").cast("double") / F.col("df_count")
    )
    return _rank(scored)


def variant_c(spark, sf_dir):
    tf = rle_pairs(read_table(spark, sf_dir, "documents"))
    wt = Window.partitionBy("term")
    scored = tf.withColumn("df_count", F.count(F.lit(1)).over(wt)).withColumn(
        "score", F.col("tf").cast("double") / F.col("df_count")
    )
    return _rank(scored)


def variant_d(spark, sf_dir):
    tf = relevance.term_freqs(read_table(spark, sf_dir, "documents"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_count"))
    scored = tf.join(dfreq, "term").withColumn(
        "score", F.col("tf").cast("double") / F.col("df_count")
    )
    return _rank(scored)


VARIANTS = {"A": variant_a, "B": variant_b, "C": variant_c, "D": variant_d}


def main():
    sf_dir = sys.argv[1]
    names = sys.argv[2].split(",") if len(sys.argv) > 2 else list(VARIANTS)
    passes = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    spark = get_spark("r13-tfidf")
    spark.sparkContext.setLogLevel("ERROR")
    read_table(spark, sf_dir, "documents").limit(1).collect()
    spark.range(1000).selectExpr("sum(id)").collect()
    timings = {}
    for _ in range(passes):
        for name in names:
            t0 = time.monotonic()
            VARIANTS[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            timings.setdefault(name, []).append(round(time.monotonic() - t0, 2))
    print(json.dumps({k: {"min": min(v), "all": v} for k, v in timings.items()}))
    spark.stop()


if __name__ == "__main__":
    main()
