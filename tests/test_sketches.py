"""Deterministic sketches (functions/sketches.py)."""

from pyspark.sql import functions as F

from scanner_spark.functions import sketches


def test_kmv_exact_below_saturation(spark):
    df = spark.createDataFrame(
        [(g, v) for g in ("a", "b") for v in range(40)], "g string, v long"
    )
    out = {r.g: (r.n_seen, r.distinct_est) for r in
           sketches.kmv_distinct(df, ["g"], "v", k=128).collect()}
    assert out == {"a": (40, 40), "b": (40, 40)}


def test_kmv_estimates_above_saturation(spark):
    n = 5000
    df = spark.createDataFrame([(v,) for v in range(n)], "v long").withColumn(
        "g", F.lit("x")
    )
    row = sketches.kmv_distinct(df, ["g"], "v", k=256).collect()[0]
    assert row.n_seen == 256
    # KMV relative error ~ 1/sqrt(k-1) ≈ 6%; allow 4 sigma
    assert abs(row.distinct_est - n) / n < 0.25


def test_kmv_duplicates_dont_inflate(spark):
    base = [(v % 50,) for v in range(2000)]  # 50 distinct, heavily repeated
    df = spark.createDataFrame(base, "v long").withColumn("g", F.lit("x"))
    row = sketches.kmv_distinct(df, ["g"], "v", k=128).collect()[0]
    assert (row.n_seen, row.distinct_est) == (50, 50)


def test_value_histogram_bins_and_clamp(spark):
    rows = [("t", -5.0), ("t", 0.0), ("t", 24.9), ("t", 25.0), ("t", 499.0),
            ("t", 1000.0)]
    df = spark.createDataFrame(rows, "g string, value double")
    out = {r.bin: (r.bin_lo, r.n) for r in
           sketches.value_histogram(df, ["g"], "value", 20, 0.0, 500.0).collect()}
    assert out[0] == (0.0, 3)     # -5 clamps in, 0.0 and 24.9 in bin 0
    assert out[1] == (25.0, 1)    # 25.0 lands in bin 1 (left-closed)
    assert out[19] == (475.0, 2)  # 499 + clamped 1000
    assert sum(n for _, n in out.values()) == len(rows)
