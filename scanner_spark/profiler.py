"""Per-query profiler: stage/task timeline export as chrome://tracing JSON.

The reference ships a profiler that collects per-worker, per-kernel
interval timelines and writes a chrome://tracing trace
(reference: python/scannerpy/profiler.py — ``write_trace``).  Under Spark
the equivalent observability source is the app status store (what the
Spark UI renders); this veneer scopes a query to a job group, runs it,
and exports every job/stage interval the query produced — name, wall
interval, task counts, executor run time, shuffle/IO metrics — as chrome
trace events plus a machine-readable summary.

Usage::

    from scanner_spark.profiler import profile
    result, trace_path = profile(spark, "q1", lambda: df.collect())

Open the trace in chrome://tracing or Perfetto.  Scale note: everything
read here is driver-side metadata (O(#stages), not O(rows)).
"""

from __future__ import annotations

import json
import os
import tempfile
import time
import uuid
from collections.abc import Callable
from typing import Any

from pyspark.sql import SparkSession


def _opt_ms(scala_opt) -> int | None:
    """scala Option[java.util.Date] -> epoch millis (or None)."""
    try:
        if scala_opt is not None and scala_opt.isDefined():
            return int(scala_opt.get().getTime())
    except Exception:
        pass
    return None


def _seq(scala_seq) -> list:
    return [scala_seq.apply(i) for i in range(scala_seq.size())]


def profile(
    spark: SparkSession,
    name: str,
    action: Callable[[], Any],
    out_path: str | None = None,
) -> tuple[Any, str]:
    """Run ``action`` under a dedicated job group and export its stage
    timeline.  Returns (action result, trace file path)."""
    sc = spark.sparkContext
    group = f"profile-{name}-{uuid.uuid4().hex[:8]}"
    sc.setJobGroup(group, f"scanner_spark profile: {name}", False)
    t0 = time.time()
    try:
        result = action()
    finally:
        sc._jsc.clearJobGroup()
    wall_s = time.time() - t0

    job_ids = sorted(sc.statusTracker().getJobIdsForGroup(group))
    events: list[dict] = []
    stages_summary: list[dict] = []
    store = sc._jsc.sc().statusStore()
    for jid in job_ids:
        try:
            jdata = store.job(jid)
        except Exception:
            continue
        sub = _opt_ms(jdata.submissionTime())
        done = _opt_ms(jdata.completionTime())
        if sub is not None:
            events.append(
                {
                    "name": f"job {jid}: {jdata.name()}",
                    "ph": "X",
                    "ts": sub * 1000,
                    "dur": ((done or sub) - sub) * 1000,
                    "pid": "jobs",
                    "tid": f"job-{jid}",
                }
            )
        for sid in _seq(jdata.stageIds()):
            try:
                # scala default args surface as stageData$default$N accessors
                defaults = [
                    getattr(store, f"stageData$default${i}")() for i in (2, 3, 4, 5)
                ]
                attempts = store.stageData(int(str(sid)), *defaults)
            except Exception:
                continue
            for sd in _seq(attempts):
                ssub = _opt_ms(sd.submissionTime())
                sdone = _opt_ms(sd.completionTime())
                if ssub is None:
                    continue
                info = {
                    "stage_id": int(sd.stageId()),
                    "attempt": int(sd.attemptId()),
                    "name": str(sd.name()),
                    "num_tasks": int(sd.numTasks()),
                    "num_complete_tasks": int(sd.numCompleteTasks()),
                    "num_failed_tasks": int(sd.numFailedTasks()),
                    "executor_run_time_ms": int(sd.executorRunTime()),
                    "executor_cpu_time_ms": int(sd.executorCpuTime()) // 1_000_000,
                    "input_bytes": int(sd.inputBytes()),
                    "output_bytes": int(sd.outputBytes()),
                    "shuffle_read_bytes": int(sd.shuffleReadBytes()),
                    "shuffle_write_bytes": int(sd.shuffleWriteBytes()),
                    "memory_spilled_bytes": int(sd.memoryBytesSpilled()),
                    "disk_spilled_bytes": int(sd.diskBytesSpilled()),
                    "wall_ms": ((sdone or ssub) - ssub),
                }
                stages_summary.append(info)
                events.append(
                    {
                        "name": f"stage {info['stage_id']}: {info['name'].splitlines()[0]}",
                        "ph": "X",
                        "ts": ssub * 1000,
                        "dur": info["wall_ms"] * 1000,
                        "pid": f"job-{jid}",
                        "tid": f"stage-{info['stage_id']}",
                        "args": info,
                    }
                )

    trace = {
        "traceEvents": events,
        "otherData": {
            "query": name,
            "wall_sec": round(wall_s, 3),
            "jobs": len(job_ids),
            "stages": stages_summary,
        },
    }
    if out_path is None:
        out_dir = os.path.join(tempfile.gettempdir(), "scanner_spark_traces")
        os.makedirs(out_dir, exist_ok=True)
        out_path = os.path.join(out_dir, f"{name}.trace.json")
    with open(out_path, "w") as f:
        json.dump(trace, f, indent=1)
    return result, out_path


def profile_query(
    spark: SparkSession, name: str, sf_dir: str, out_path: str | None = None
) -> tuple[int, str]:
    """Profile one suite query by name (from queries.QUERIES): runs
    ``.count()`` under the profiler.  Returns (row count, trace path)."""
    from scanner_spark import queries as Q

    fn = Q.QUERIES[name]
    return profile(spark, name, lambda: fn(spark, sf_dir).count(), out_path)
