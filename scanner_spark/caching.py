"""Scoped lifecycle for persisted intermediates.

Query builders persist shared subplans (shingle tables, MinHash signatures,
collapsed representatives) that must outlive the builder call: the caller
executes the returned lazy plan afterwards, so a try/finally inside the
builder cannot release them.  Instead every such persist goes through
:func:`track`, which gives two guarantees a long-lived session needs:

- **bounded residency** — a FIFO cap (`CACHE_SLOTS`): once more than that
  many intermediates are live, the oldest is unpersisted immediately, so a
  session running the dedup suite in a loop can never accumulate storage
  until eviction pressure (the failure mode is deterministic release, not
  LRU luck);
- **eager release** — :func:`release_all` (re-exported as
  ``scanner_spark.release_cached``) drops every tracked block plus the
  stream-layout slot; bench harnesses and services call it between queries,
  and :func:`scoped_caches` wraps it as a context manager for callers that
  execute their actions inside a block.

Unpersist is always best-effort: blocks of a stopped session are already
gone, and losing a cache is a performance event, never a correctness one
(persisted plans stay recomputable from lineage — the reason the engine
uses persist, not checkpoints, for intermediates).
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame

# max persisted intermediates live at once; the dedup family persists <=3
# per query, so 8 covers a few concurrent queries while bounding storage
CACHE_SLOTS = 8

_TRACKED: list[DataFrame] = []


def _drop(df: DataFrame) -> None:
    try:
        df.unpersist(blocking=False)
    except Exception:
        pass  # owning session stopped; its blocks are already gone


def track(df: DataFrame) -> DataFrame:
    """Persist ``df`` and register it for bounded, releasable residency."""
    df = df.persist()
    _TRACKED.append(df)
    while len(_TRACKED) > CACHE_SLOTS:
        _drop(_TRACKED.pop(0))
    return df


def release_all() -> None:
    """Unpersist every tracked intermediate and the stream-layout slot."""
    from scanner_spark import streams

    streams.release_cached()
    while _TRACKED:
        _drop(_TRACKED.pop())


@contextmanager
def scoped_caches():
    """Release every intermediate persisted inside the block on exit.

    Use when the actions run inside the block::

        with scoped_caches():
            dedup.minhash_lsh_pairs(docs).write.parquet(out)
    """
    mark = len(_TRACKED)
    try:
        yield
    finally:
        while len(_TRACKED) > mark:
            _drop(_TRACKED.pop())
