"""Distributed sketches with deterministic, oracle-reproducible estimates.

At 100 TB, exact distinct counts and full histograms are often the wrong
tool — the standard practice is a mergeable sketch computed in one pass.
Spark's built-ins (``approx_count_distinct`` HLL++, ``approx_percentile``)
are the production path but their binary internals aren't reproducible in
another engine, so they can't be value-hash checked.  This module provides
the classical *deterministic* alternatives built on the shared 60-bit md5
hash (functions/hashing.h60), which DuckDB replicates bit-for-bit:

- **KMV (k-minimum-values) distinct sketch**: keep the k smallest hash
  values per group; estimate N ≈ (k-1) * 2^60 / h_(k).  Mergeable
  (union = k smallest of the concatenation), one shuffle keyed by group,
  O(k) state per group — the same properties that made it the basis of
  the theta sketch family.  Groups with fewer than k distinct hashes
  report the exact count (the estimator is exact below saturation).
- **Equi-width histogram**: fixed [lo, hi) bins via pure integer floor
  arithmetic — the partial-aggregatable building block behind
  numeric-profile jobs; bins shuffle pre-aggregated (map-side combine).

Estimator arithmetic sticks to IEEE-double operations on exactly
representable integers ((k-1) * 2^60 has a 9-bit mantissa) so Spark and
DuckDB produce identical bits — see the oracle twins in __spark_entry__.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from scanner_spark.functions.hashing import HASH_BITS, h60

DEFAULT_KMV_K = 128


def kmv_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = DEFAULT_KMV_K,
) -> DataFrame:
    """Per-group distinct-count estimate from the k minimum hash values:
    (group_cols..., n_seen, distinct_est).

    ``n_seen`` = min(k, distinct hashes) — below saturation the estimate
    IS the exact distinct count.  The kth-smallest selection is a
    per-group window over the *distinct hash* set, so the sort input is
    already collapsed to one row per distinct value; the heavy stream
    never sorts."""
    hv = (
        df.select(*group_cols, h60(F.col(value_col).cast("string")).alias("hv"))
        .distinct()
    )
    w = Window.partitionBy(*group_cols).orderBy("hv")
    topk = hv.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)
    est = F.floor(
        F.lit(float((k - 1) * (1 << HASH_BITS))) / F.col("kth")
    ).cast("long")
    return (
        topk.groupBy(*group_cols)
        .agg(F.count(F.lit(1)).alias("n_seen"), F.max("hv").alias("kth"))
        .select(
            *group_cols,
            F.col("n_seen").cast("long").alias("n_seen"),
            F.when(F.col("n_seen") < k, F.col("n_seen").cast("long"))
            .otherwise(est)
            .alias("distinct_est"),
        )
    )


def value_histogram(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    nbins: int,
    lo: float,
    hi: float,
) -> DataFrame:
    """Per-group equi-width histogram over [lo, hi): (group_cols..., bin,
    bin_lo, n).  Out-of-range values clamp into the edge bins (the
    numeric-profiler convention).  Pure integer floor arithmetic —
    partial-aggregated map-side, one shuffle of (group, bin) counts."""
    width = (hi - lo) / nbins
    raw = F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width))
    bin_ = F.least(F.greatest(raw, F.lit(0)), F.lit(nbins - 1)).cast("int")
    return (
        df.select(*group_cols, bin_.alias("bin"))
        .groupBy(*group_cols, "bin")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            *group_cols,
            F.col("bin"),
            F.round(F.lit(lo) + F.col("bin") * F.lit(width), 6).alias("bin_lo"),
            F.col("n").cast("long").alias("n"),
        )
    )
