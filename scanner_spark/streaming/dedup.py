"""Streaming MinHash-LSH near-duplicate detection.

The state-store analog of the batch ``functions.dedup.minhash_lsh_pairs``:
documents arrive on a stream, each is sketched to banded MinHash signatures
**per row** (no aggregation — legal upstream of a streaming stateful op),
and an ``applyInPandasWithState`` operator keyed by ``(band, band_sig)``
holds each bucket's previously-seen documents, emitting a scored pair the
moment a new arrival collides with one.

Batch equivalence (the correctness contract, checked by the
``stream_dedup_minhash_lsh`` suite entry against the SAME DuckDB oracle as
the batch query): on a bounded replay, the DISTINCT emitted pair set equals
the batch query's output — same shingles, same h60 hash, same permutation
coefficients, same md5 band signatures, same ``matches/k`` scoring.  A pair
colliding in several bands is emitted once per band (different state keys
cannot coordinate); readers take ``DISTINCT``, and the score is identical on
every emission (it is a pure function of the two signatures).

Scale design: state is sharded by (band, band_sig) — cardinality ~
``bands x |distinct signatures|``, so state skew follows bucket skew exactly
as the batch join's fan-out does; each bucket holds only ids + k-long
signatures, never text.  On an unbounded production stream, pair recall is
traded for bounded state by expiring idle buckets with a state timeout
(``timeout='ProcessingTimeTimeout'`` + ``state.setTimeoutDuration``) —
the bounded-replay suite entry keeps NoTimeout so its output is exactly the
batch set.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from scanner_spark.functions.dedup import DEFAULT_BANDS, DEFAULT_MINHASH_K, DEFAULT_SHINGLE_N, shingles
from scanner_spark.functions.hashing import MINHASH_P, h60, minhash_coeffs

PAIR_SCHEMA = "doc_a long, doc_b long, est_jaccard double"
_STATE_SCHEMA = "docs array<long>, sigs array<array<long>>"


def banded_minhash_rows(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = DEFAULT_MINHASH_K,
    bands: int = DEFAULT_BANDS,
    n: int = DEFAULT_SHINGLE_N,
) -> DataFrame:
    """Per-ROW banded MinHash: (doc, sig: array<long>, band, bs) rows.

    Narrow — shingling, hashing, k permutation minima, and band md5s are
    all JVM higher-order functions over this row's shingle array, so the
    transform is streaming-legal (no shuffle, no state) and emits the
    bit-identical signatures the batch ``minhash_signatures`` aggregation
    produces.  Docs with no shingles (< n tokens) are dropped, matching
    the batch contract (no signature row)."""
    sh = shingles(F.col(text_col), n)
    base = df.select(
        F.col(id_col).alias("doc"),
        F.transform(sh, lambda s: h60(s) % F.lit(MINHASH_P)).alias("__hm"),
    ).filter(F.size("__hm") > 0)
    def _perm(a: int, b: int):
        # closure (not default-arg lambda): Spark counts lambda PARAMETERS,
        # and transform() only accepts 1- or 2-arg lambdas
        return lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(MINHASH_P)

    mins = [
        F.array_min(F.transform(F.col("__hm"), _perm(a, b))).alias(f"m{i}")
        for i, (a, b) in enumerate(minhash_coeffs(k))
    ]
    sig = base.select("doc", *mins)
    r = k // bands
    band_cols = [
        F.md5(
            F.concat_ws(",", *[F.col(f"m{i}").cast("string") for i in range(b * r, (b + 1) * r)])
        ).alias(f"band{b}")
        for b in range(bands)
    ]
    return sig.select(
        "doc",
        F.array(*[F.col(f"m{i}") for i in range(k)]).alias("sig"),
        F.posexplode(F.array(*band_cols)).alias("band", "bs"),
    )


def lsh_dedup_pairs(
    banded: DataFrame,
    k: int = DEFAULT_MINHASH_K,
    threshold: float = 0.5,
    timeout: str = "NoTimeout",
) -> DataFrame:
    """Stateful pair emission: per (band, band_sig) bucket, every new doc
    is scored (matching mins / k) against the bucket's seen docs; pairs at
    or above ``threshold`` are emitted with (least, greatest) id order —
    the batch query's pair orientation."""

    def fn(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        if state.exists:
            st_docs, st_sigs = state.get
            docs = [int(d) for d in st_docs]
            sigs = [list(int(x) for x in s) for s in st_sigs]
        else:
            docs, sigs = [], []
        out_a: list[int] = []
        out_b: list[int] = []
        out_e: list[float] = []
        for pdf in pdfs:
            for doc, sig in zip(pdf["doc"], pdf["sig"]):
                doc = int(doc)
                sig = [int(x) for x in sig]
                for d2, s2 in zip(docs, sigs):
                    m = sum(1 for x, y in zip(sig, s2) if x == y)
                    est = round(m / k, 6)
                    if est >= threshold:
                        out_a.append(min(doc, d2))
                        out_b.append(max(doc, d2))
                        out_e.append(est)
                docs.append(doc)
                sigs.append(sig)
        state.update((docs, sigs))
        yield pd.DataFrame({"doc_a": out_a, "doc_b": out_b, "est_jaccard": out_e})

    return banded.groupBy("band", "bs").applyInPandasWithState(
        fn,
        outputStructType=PAIR_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=getattr(GroupStateTimeout, timeout),
    )
