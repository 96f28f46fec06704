"""Fault-tolerance behavior, mirroring the reference's kill/blacklist
suite in spirit (reference: tests/py_test.py:788-1158 — killed workers,
job blacklisting, task retry).

Under Spark the mapping is:

- a kernel raising on a poison element with ``on_error='null'`` must
  "blacklist" only the poisoned element (elementwise path) or only its
  (stream, slice) group (stateful path) — every other element/group keeps
  its real output (the analog of master.cpp:986-1018 job blacklisting);
- a transiently-failing task must be retried by the scheduler and the
  query still produce the complete, correct result (the analog of worker
  kill + rescheduling).  Local-mode Spark defaults to maxFailures=1, so
  the retry test runs in its own ``local[2,2]`` session in a subprocess.
"""

import os
import subprocess
import sys

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scanner_spark.ops import register_op  # noqa: E402


def test_elementwise_poison_row_nulls_only_that_element(two_streams):
    @register_op(on_error="null")
    def poison(v):
        if v == 105.0:  # stream 1, idx 5
            raise RuntimeError("poison")
        return v * 2.0

    out = poison(two_streams, ["value"], "doubled", "double")
    rows = {(r["stream_id"], r["idx"]): r["doubled"] for r in out.collect()}
    assert rows[("1", 5)] is None
    # neighbors and the other stream are untouched
    assert rows[("1", 4)] == 208.0
    assert rows[("1", 6)] == 212.0
    assert rows[("0", 5)] == 10.0
    assert sum(v is None for v in rows.values()) == 1


def test_batch_poison_isolated_per_element(two_streams):
    @register_op(batch=True, on_error="null")
    def poison_batch(v: pd.Series) -> pd.Series:
        if (v == 105.0).any():
            raise RuntimeError("poison batch")
        return v * 2.0

    out = poison_batch(two_streams, ["value"], "doubled", "double")
    rows = {(r["stream_id"], r["idx"]): r["doubled"] for r in out.collect()}
    assert rows[("1", 5)] is None
    assert rows[("1", 4)] == 208.0
    assert sum(v is None for v in rows.values()) == 1


def test_stateful_poison_blacklists_only_its_group(two_streams):
    """A poisoned element inside a stateful group nulls that GROUP's
    outputs (state is unrecoverable mid-stream) — the other stream keeps
    real outputs, exactly the per-job blacklist contract."""

    class CumSum:
        def reset(self):
            self.total = 0.0

        def execute(self, values: pd.Series) -> pd.Series:
            if (values == 105.0).any():
                raise RuntimeError("poison group")
            return values.cumsum()

    op = register_op(CumSum, unbounded_state=True, on_error="null")
    out = op(two_streams, ["value"], "cum", "double")
    rows = {(r["stream_id"], r["idx"]): r["cum"] for r in out.collect()}
    assert all(rows[("1", i)] is None for i in range(30))
    assert rows[("0", 2)] == 0.0 + 1.0 + 2.0
    assert rows[("0", 29)] == sum(float(i) for i in range(30))


RETRY_SCRIPT = r"""
import sys
sys.path.insert(0, {repo!r})
import os, tempfile
from pyspark.sql import SparkSession, functions as F

marker = sys.argv[1]

# local[2,2]: 2 threads, maxFailures=2 -> one retry per task
spark = (
    SparkSession.builder.master("local[2,2]")
    .appName("retry-test")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)

import pandas as pd

@F.pandas_udf("double")
def flaky(v: pd.Series) -> pd.Series:
    from pyspark import TaskContext
    tc = TaskContext.get()
    # fail the FIRST attempt of every task once, using a filesystem marker
    # (executor threads share the local filesystem)
    flag = f"{{marker}}-p{{tc.partitionId()}}"
    if tc.attemptNumber() == 0 and not os.path.exists(flag):
        open(flag, "w").close()
        raise RuntimeError("transient failure (first attempt)")
    return v * 2.0

df = spark.range(0, 1000).select(F.col("id").cast("double").alias("v"))
out = df.repartition(2).select(flaky(F.col("v")).alias("d"))
total = out.agg(F.sum("d")).first()[0]
assert total == sum(i * 2.0 for i in range(1000)), total
print("RETRY_OK", total)
spark.stop()
"""


def test_task_retry_recovers_transient_failure(tmp_path):
    """Every task fails its first attempt; with maxFailures=2 the
    scheduler reruns it and the job completes with the full correct
    result — Spark's replacement for the reference's worker-kill
    rescheduling (py_test.py:788-900)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = RETRY_SCRIPT.format(repo=repo)
    proc = subprocess.run(
        [sys.executable, "-c", script, str(tmp_path / "attempt")],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "RETRY_OK" in proc.stdout
