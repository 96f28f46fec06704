"""Deterministic cross-engine hashing primitives.

Every dedup/sketch operator needs integer hashes that are *identical* in
Spark and in the DuckDB oracle.  Neither engine's native hash() matches the
other, but both compute identical md5 hex; a 15-hex-digit prefix parsed as
an integer yields a uniform 60-bit hash computable in both:

  Spark :  conv(substring(md5(x), 1, 15), 16, 10)  -> decimal string -> long
  DuckDB:  CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)

All sketches (MinHash permutations, SimHash bits) are affine/bit functions
of this one hash, so the oracle replicates them exactly.  JVM-side md5 —
no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# 60-bit hash space
HASH_BITS = 60

# universal-hash modulus (prime > 2^32) and deterministic coefficients:
# h_i(x) = (A[i] * (H(x) mod P) + B[i]) mod P.  (H mod P) < 2^33 and
# A[i] < 2^30, so products stay < 2^63 — no 64-bit overflow in either engine.
MINHASH_P = 4294967311
_SEED_A, _SEED_B = 1103515245, 12345


def minhash_coeffs(k: int) -> list[tuple[int, int]]:
    """k deterministic (a, b) pairs from a tiny LCG (seeded, engine-free)."""
    coeffs, x = [], 42
    for _ in range(k):
        x = (_SEED_A * x + _SEED_B) % (1 << 30)
        a = x | 1  # odd, nonzero
        x = (_SEED_A * x + _SEED_B) % (1 << 30)
        b = x
        coeffs.append((a, b))
    return coeffs


def h60(col: Column) -> Column:
    """The shared 60-bit integer hash of a string column."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def h60_sql(expr: str) -> str:
    """DuckDB rendering of the same hash."""
    return f"CAST('0x' || substr(md5({expr}), 1, 15) AS BIGINT)"
