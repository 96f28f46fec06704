"""Storage hygiene: persisted intermediates are bounded while queries run
and fully releasable afterwards — a long-lived session looping the dedup
suite must not accumulate cache blocks until eviction pressure."""

import time

from scanner_spark.functions import dedup
from scanner_spark import caching
from scanner_spark.io import read_table


def _n_persistent(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def test_dedup_suite_storage_returns_to_baseline(spark, sf_dir):
    caching.release_all()
    time.sleep(0.5)
    base = _n_persistent(spark)
    docs = read_table(spark, sf_dir, "documents")
    for _ in range(2):  # the accumulation scenario: suite run in a loop
        assert dedup.minhash_lsh_pairs(docs).count() >= 0
        assert dedup.ngram_jaccard_pairs(docs).count() >= 0
    # while running, residency is bounded by the FIFO cap
    assert len(caching._TRACKED) <= caching.CACHE_SLOTS
    assert _n_persistent(spark) <= base + caching.CACHE_SLOTS
    caching.release_all()
    # unpersist is async; poll until the blocks are gone
    for _ in range(40):
        if _n_persistent(spark) <= base:
            break
        time.sleep(0.25)
    assert _n_persistent(spark) <= base
    assert not caching._TRACKED


def test_scoped_caches_releases_on_exit(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    before = len(caching._TRACKED)
    with caching.scoped_caches():
        assert dedup.minhash_lsh_pairs(docs).count() >= 0
        assert len(caching._TRACKED) > before
    assert len(caching._TRACKED) == before


def test_track_evicts_oldest_beyond_cap(spark):
    caching.release_all()
    dfs = [spark.range(i, i + 10) for i in range(caching.CACHE_SLOTS + 3)]
    for d in dfs:
        caching.track(d)
    assert len(caching._TRACKED) == caching.CACHE_SLOTS
    # the survivors are the MOST RECENT trackings (FIFO eviction)
    assert caching._TRACKED[-1] is dfs[-1]
    caching.release_all()
    assert not caching._TRACKED
