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


def test_stream_cache_keyed_by_live_session(spark, sf_dir):
    """The events-stream memo must live ON the session (never a module
    dict keyed by id(spark): a GC'd session's id can be reused by a new
    one, silently serving a plan bound to dead relations — VERDICT r04
    finding #3).  Distinct sessions get distinct entries; a dropped
    session's entries die with it."""
    import gc
    import weakref

    from scanner_spark import queries as Q

    a = Q.events_stream(spark, sf_dir)
    assert Q.events_stream(spark, sf_dir) is a  # same-session cache hit
    ns = spark.newSession()
    b = Q.events_stream(ns, sf_dir)
    assert b is not a  # no cross-session aliasing
    assert Q.events_stream(spark, sf_dir) is a  # first entry undisturbed
    # the memo lives on the session object, so it can never alias onto a
    # different session — even one allocated at the recycled id() of a
    # dropped one (which a module-level {id(spark): plan} dict would hit).
    # NOTE: full collection of the dropped wrapper is NOT asserted; pyspark
    # itself retains sessions in a closure cell, out of our control.
    old_id = id(ns)
    del ns, b
    gc.collect()
    fresh = spark.newSession()
    assert not hasattr(fresh, Q._STREAM_CACHE_ATTR)  # born with no memo
    c = Q.events_stream(fresh, sf_dir)
    assert c is not a  # never the other session's plan, whatever id() says
    del old_id, fresh, c
    assert getattr(spark, Q._STREAM_CACHE_ATTR)[sf_dir] is a
