"""Distributed k-means over embedding columns (Lloyd's algorithm).

Embedding-space clustering drives training-data curation at scale: domain
discovery, diversity-aware sampling, dedup blocking, and mixture balancing
all start from "partition the corpus by embedding cluster".  (The reference
engine has no vector layer; this extends the simsearch family —
simsearch.py's IVF index is one assignment step of exactly this loop.)

Scale design (the 100 TB story):
- The model is always driver-resident and tiny (k x dim doubles); the DATA
  never moves.  Assignment is a narrow, shuffle-free JVM expression: per
  row, argmin over k literal centroids of the squared distance, computed
  by zip_with + an ordered aggregate fold — whole-stage codegen, no
  Python, pipelines with the scan.
- The update step avoids the posexplode anti-pattern (dim x row
  inflation + a corpus-sized shuffle).  Instead ``mapInPandas`` reduces
  each PARTITION to k partial (count, sum-vector) rows — output is
  #partitions x k rows regardless of corpus size — and the driver sums
  those partials (the bounded-collect pattern of pq_train/ivf_index).
- Iterations are a driver loop over cheap jobs; centroids re-enter the
  plan as literals, so every round is again narrow.  No lineage growth:
  each round's plan is built fresh from the source DataFrame.

Determinism contract: seeds are the k lowest-id vectors (no RNG), and
updated centroids are rounded to ``round_decimals`` (default 6) before
re-entering the plan.  Rounding collapses summation-order ulp noise, so
assignments — and therefore every integer output — are reproducible
across runs, partitionings, and engines (the DuckDB oracle unrolls the
same rounded iterations in SQL).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

DEFAULT_K = 8
DEFAULT_ITERS = 3
ROUND_DECIMALS = 6


def _dvec(vec_col: str) -> Column:
    return F.transform(F.col(vec_col), lambda x: x.cast("double"))


def sqdist_to(vec: Column, centroid: list[float]) -> Column:
    """Squared L2 distance from ``vec`` (array<double>) to a literal
    centroid — ordered left-to-right fold, so any engine that sums the
    term list sequentially produces the bit-identical double."""
    carr = F.array(*[F.lit(float(x)) for x in centroid])
    return F.aggregate(
        F.zip_with(vec, carr, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def assign(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Assign each vector to its nearest centroid (ties -> lowest cluster
    id, via lexicographic struct min).  Narrow; no shuffle."""
    v = _dvec(vec_col)
    cands = F.array(
        *[
            F.struct(
                sqdist_to(v, c).alias("dist"), F.lit(int(cid)).alias("cid")
            )
            for cid, c in centroids
        ]
    )
    best = F.array_min(cands)
    return df.select(
        F.col(id_col),
        best["cid"].alias("cluster"),
        best["dist"].alias("dist"),
    )


def seed_centroids(
    df: DataFrame,
    k: int = DEFAULT_K,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[tuple[int, list[float]]]:
    """Deterministic seeds: the k lowest-id vectors, cluster i = i-th
    lowest.  A k-row TakeOrdered collect — bounded by k x dim."""
    rows = (
        df.select(id_col, _dvec(vec_col).alias("v"))
        .orderBy(F.col(id_col).asc())
        .limit(k)
        .collect()
    )
    return [(i, list(r["v"])) for i, r in enumerate(rows)]


def _partial_sums(k: int, dim: int, vec_col: str):
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts = np.zeros(k, dtype=np.int64)
        sums = np.zeros((k, dim), dtype=np.float64)
        for pdf in batches:
            if not len(pdf):
                continue
            vecs = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            cl = pdf["cluster"].to_numpy()
            for c in range(k):
                m = cl == c
                if m.any():
                    counts[c] += int(m.sum())
                    sums[c] += vecs[m].sum(axis=0)
        nz = np.nonzero(counts)[0]
        # explicit dtypes: an EMPTY partition must still yield an
        # object-dtype vsum column — pandas would otherwise infer float64
        # for the empty list and Arrow cannot cast that to list<double>
        # (hit on sf1 where the scan plans empty input splits)
        yield pd.DataFrame(
            {
                "cluster": pd.Series(nz.astype("int64"), dtype="int64"),
                "n": pd.Series(counts[nz], dtype="int64"),
                "vsum": pd.Series(
                    [sums[c].tolist() for c in nz], dtype="object"
                ),
            }
        )

    return fn


def kmeans(
    df: DataFrame,
    k: int = DEFAULT_K,
    iters: int = DEFAULT_ITERS,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_decimals: int = ROUND_DECIMALS,
) -> tuple[DataFrame, list[tuple[int, list[float]]]]:
    """Lloyd's k-means: returns (assignments DataFrame, final centroids).

    Each iteration: narrow assignment -> per-partition partial sums
    (#partitions x k rows) -> driver mean + round.  A cluster that loses
    all members keeps its previous centroid (no respawn heuristics — the
    deterministic choice)."""
    cents = seed_centroids(df, k, vec_col, id_col)
    if len(cents) < k:
        raise ValueError(
            f"kmeans needs at least k={k} rows to seed centroids; "
            f"input has only {len(cents)}"
        )
    dim = len(cents[0][1])
    src = df.select(F.col(id_col), _dvec(vec_col).alias("__v"))
    for _ in range(iters):
        assigned = src.select(
            "*",
            F.array_min(
                F.array(
                    *[
                        F.struct(
                            sqdist_to(F.col("__v"), c).alias("dist"),
                            F.lit(int(cid)).alias("cid"),
                        )
                        for cid, c in cents
                    ]
                )
            )["cid"].alias("cluster"),
        )
        partials = assigned.mapInPandas(
            _partial_sums(k, dim, "__v"),
            schema="cluster long, n long, vsum array<double>",
        ).collect()
        counts = np.zeros(k, dtype=np.int64)
        sums = np.zeros((k, dim), dtype=np.float64)
        for r in partials:
            counts[r["cluster"]] += r["n"]
            sums[r["cluster"]] += np.asarray(r["vsum"])
        new_cents = []
        for cid, old in cents:
            if counts[cid] > 0:
                mean = np.round(sums[cid] / counts[cid], round_decimals)
                new_cents.append((cid, [float(x) for x in mean]))
            else:
                new_cents.append((cid, old))
        cents = new_cents
    out = assign(
        src.withColumnRenamed("__v", vec_col), cents, vec_col, id_col
    )
    return out, cents
