"""Profiler veneer (reference analog: python/scannerpy/profiler.py
write_trace — chrome://tracing export of per-kernel timelines; here the
timeline source is Spark's app status store)."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scanner_spark.profiler import profile, profile_query  # noqa: E402


def test_profile_emits_chrome_trace(spark, sf_dir, tmp_path):
    out = str(tmp_path / "q.trace.json")
    n, path = profile_query(spark, "tpch_q3", sf_dir, out)
    assert path == out and os.path.exists(path)
    t = json.load(open(path))
    events = t["traceEvents"]
    stages = t["otherData"]["stages"]
    assert len(events) > 0 and len(stages) > 0
    # chrome trace contract: complete events with microsecond ts/dur
    assert all(e["ph"] == "X" and e["dur"] >= 0 for e in events)
    # stage rows carry the per-stage metrics a kernel timeline needs
    s = stages[0]
    for k in ("executor_run_time_ms", "shuffle_read_bytes", "num_tasks", "wall_ms"):
        assert k in s
    # a join+agg query must show at least one shuffle boundary
    assert any(
        s["shuffle_write_bytes"] > 0 or s["shuffle_read_bytes"] > 0 for s in stages
    )


def test_profile_scopes_to_its_own_job_group(spark):
    # two profiles back-to-back must not bleed each other's jobs
    _, p1 = profile(spark, "g1", lambda: spark.range(10).count())
    _, p2 = profile(spark, "g2", lambda: spark.range(10).count())
    t1, t2 = json.load(open(p1)), json.load(open(p2))
    assert t1["otherData"]["jobs"] >= 1 and t2["otherData"]["jobs"] >= 1
    ids1 = {e["tid"] for e in t1["traceEvents"] if str(e["pid"]) == "jobs"}
    ids2 = {e["tid"] for e in t2["traceEvents"] if str(e["pid"]) == "jobs"}
    assert not (ids1 & ids2)
