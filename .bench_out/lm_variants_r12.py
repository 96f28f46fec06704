#!/usr/bin/env python
"""Round-12 plan-variant measurement for doc_lm_familiarity (VERDICT r11
'do this' #1: the fused tokenizer-to-pair generator).

Variants (all produce identical (doc, fam_total, n_bigrams) results):
  current : r11 shipped plan — toks barrier Generate, th barrier Generate
            (transform h60, interpreted), zip_with struct pairs
            (interpreted), explode, hash agg, window(ha,hb), final agg.
  fused1  : ONE barrier Generate producing the hashed-token array directly
            (transform's single array input evaluates once, so the toks
            barrier is redundant); zip_with pairs as before.
  fusedz  : fused1 + arrays_zip(slice, slice) instead of zip_with — the
            pair construction leaves the interpreted HOF path (arrays_zip
            is a plain codegen expression, no lambda).
  fullfuse: zero barriers — single Generate explodes
            zip_with(slice(toks), slice(toks), (a,b)->struct(h60(a),h60(b)))
            with toks an attribute from one barrier; hashes each token
            TWICE inside the interpreted lambda (the r7-cost shape).

Usage: python lm_variants_r12.py <sf_dir> <variant1,variant2,...> [passes]
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import Window, functions as F  # noqa: E402

from scanner_spark.session import get_spark  # noqa: E402
from scanner_spark.functions.hashing import h60  # noqa: E402
from scanner_spark.functions.relevance import _toks  # noqa: E402
from scanner_spark.io import read_table  # noqa: E402


def _finish(bg):
    w = Window.partitionBy("ha", "hb")
    return (
        bg.withColumn("global_n", F.sum("n").over(w))
        .groupBy("doc")
        .agg(
            F.sum(F.col("n") * F.col("global_n")).alias("fam_total"),
            F.sum("n").alias("n_bigrams"),
        )
    )


def plan_current(df):
    toksed = df.select(
        F.col("doc_id").alias("doc"),
        F.explode(F.array(_toks(F.col("text")))).alias("toks"),
    )
    hashed = toksed.select(
        "doc",
        F.explode(F.array(F.transform(F.col("toks"), h60))).alias("th"),
    )
    th = F.col("th")
    n1 = F.greatest(F.size(th) - 1, F.lit(0))
    pairs = F.zip_with(
        F.slice(th, F.lit(1), n1),
        F.slice(th, F.lit(2), n1),
        lambda a, b: F.struct(a.alias("ha"), b.alias("hb")),
    )
    bg = (
        hashed.select("doc", F.explode(pairs).alias("p"))
        .groupBy("doc", F.col("p.ha").alias("ha"), F.col("p.hb").alias("hb"))
        .agg(F.count("*").alias("n"))
    )
    return _finish(bg)


def plan_fused1(df):
    hashed = df.select(
        F.col("doc_id").alias("doc"),
        F.explode(
            F.array(F.transform(_toks(F.col("text")), h60))
        ).alias("th"),
    )
    th = F.col("th")
    n1 = F.greatest(F.size(th) - 1, F.lit(0))
    pairs = F.zip_with(
        F.slice(th, F.lit(1), n1),
        F.slice(th, F.lit(2), n1),
        lambda a, b: F.struct(a.alias("ha"), b.alias("hb")),
    )
    bg = (
        hashed.select("doc", F.explode(pairs).alias("p"))
        .groupBy("doc", F.col("p.ha").alias("ha"), F.col("p.hb").alias("hb"))
        .agg(F.count("*").alias("n"))
    )
    return _finish(bg)


def plan_fusedz(df):
    hashed = df.select(
        F.col("doc_id").alias("doc"),
        F.explode(
            F.array(F.transform(_toks(F.col("text")), h60))
        ).alias("th"),
    )
    th = F.col("th")
    n1 = F.greatest(F.size(th) - 1, F.lit(0))
    pairs = F.arrays_zip(
        F.slice(th, F.lit(1), n1).alias("ha"),
        F.slice(th, F.lit(2), n1).alias("hb"),
    )
    bg = (
        hashed.select("doc", F.explode(pairs).alias("p"))
        .groupBy("doc", F.col("p.ha").alias("ha"), F.col("p.hb").alias("hb"))
        .agg(F.count("*").alias("n"))
    )
    return _finish(bg)


def plan_fullfuse(df):
    toksed = df.select(
        F.col("doc_id").alias("doc"),
        F.explode(F.array(_toks(F.col("text")))).alias("toks"),
    )
    tk = F.col("toks")
    n1 = F.greatest(F.size(tk) - 1, F.lit(0))
    pairs = F.zip_with(
        F.slice(tk, F.lit(1), n1),
        F.slice(tk, F.lit(2), n1),
        lambda a, b: F.struct(h60(a).alias("ha"), h60(b).alias("hb")),
    )
    bg = (
        toksed.select("doc", F.explode(pairs).alias("p"))
        .groupBy("doc", F.col("p.ha").alias("ha"), F.col("p.hb").alias("hb"))
        .agg(F.count("*").alias("n"))
    )
    return _finish(bg)


PLANS = {
    "current": plan_current,
    "fused1": plan_fused1,
    "fusedz": plan_fusedz,
    "fullfuse": plan_fullfuse,
}


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2].split(",")
    passes = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    spark = get_spark("lm-variants-r12")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    docs = read_table(spark, sf_dir, "documents")
    docs.limit(1).collect()
    # equivalence check once at this sf: every variant must hash-match
    ref = None
    for name in names:
        d = PLANS[name](docs)
        chk = d.agg(
            F.sum(F.hash("doc", "fam_total", "n_bigrams")).alias("c"),
            F.count("*").alias("n"),
        ).collect()[0]
        if ref is None:
            ref = (chk["c"], chk["n"])
        assert (chk["c"], chk["n"]) == ref, (name, chk, ref)
    print(json.dumps({"equiv_check": "ok", "rows": ref[1]}), flush=True)
    for name in names:
        fn = PLANS[name]
        ts = []
        for _ in range(passes):
            t0 = time.monotonic()
            fn(docs).write.format("noop").mode("overwrite").save()
            ts.append(round(time.monotonic() - t0, 2))
            spark.catalog.clearCache()
        print(json.dumps({"sf_dir": sf_dir, "variant": name,
                          "passes": ts, "min": min(ts)}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
