"""Skew mitigation utilities.

First line of defense is AQE (`spark.sql.adaptive.skewJoin.enabled`, on by
default in `scanner_spark.session`): it splits oversized shuffle-join
partitions at runtime.  These helpers cover the residual cases:

- a shuffle join where ONE key is so hot that even a split partition
  re-skews (``salted_join``: spread the hot side over N salt buckets,
  replicate the other side N ways — shuffle becomes uniform by
  construction);
- heavy aggregations whose per-key state is large (``two_phase_agg``:
  pre-aggregate on (key, salt) before the final combine, bounding any
  single task's state).

Both are deterministic: salt is a hash of a caller-chosen column, never
``rand()``, so retried tasks recompute identical results (required for
exactly-once sinks and the oracle-parity bar).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: Sequence[str],
    salt_from: str | Column,
    buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join with the skewed side's hot keys spread over ``buckets`` salts.

    ``skewed`` gets ``salt = pmod(hash(salt_from), buckets)`` (deterministic);
    ``other`` is exploded ``buckets``-fold with every salt value, so the
    equi-join on (keys..., salt) meets each salted shard.  Result set is
    identical to the unsalted join; shuffle skew on the hot key drops by
    ~``buckets``x at the cost of replicating the other side.
    """
    if buckets < 1:
        raise ValueError(f"buckets must be >= 1, got {buckets}")
    salt_col = F.pmod(F.hash(F.col(salt_from) if isinstance(salt_from, str) else salt_from), F.lit(buckets))
    left = skewed.withColumn("__salt", salt_col)
    right = other.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    out = left.join(right, [*on, "__salt"], how)
    return out.drop("__salt")


def two_phase_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    salt_from: str | Column,
    buckets: int = 32,
) -> DataFrame:
    """Aggregation with an explicit salted pre-combine.

    ``aggs`` maps output column -> (input column, fn) where fn is one of
    sum/count/min/max (the decomposable aggregates).  Phase 1 aggregates on
    (keys..., salt) — bounded task state even for a single giant key —
    phase 2 combines the per-salt partials.  For plain sum/count Spark's
    map-side partial aggregation already does this; use it when the hot
    key's partials themselves overwhelm one reducer."""
    recombine = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    phase1 = []
    for out, (col, fn) in aggs.items():
        if fn not in recombine:
            raise ValueError(f"{fn!r} is not decomposable (sum/count/min/max)")
        phase1.append(getattr(F, fn)(col).alias(out))
    salt_col = F.pmod(F.hash(F.col(salt_from) if isinstance(salt_from, str) else salt_from), F.lit(buckets))
    partial = df.withColumn("__salt", salt_col).groupBy(*keys, "__salt").agg(*phase1)
    final = partial.groupBy(*keys).agg(
        *[recombine[fn](out).alias(out) for out, (_, fn) in aggs.items()]
    )
    return final
