"""Round-15 isolated probe: vectorized stencil window realignment (new)
vs the round-14 per-row dict realignment (old, reconstructed from git
HEAD), interleaved, 2 reps, noop writes, on the frame_optical_flow plan.
Usage: python .bench_out/probe_r15_stencil.py /root/repo/.bench_data/sf10
"""
import importlib.util
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession, functions as F

spec = importlib.util.spec_from_file_location("ops_old", "/tmp/opsold/ops_old.py")
ops_old = importlib.util.module_from_spec(spec)
spec.loader.exec_module(ops_old)

from scanner_spark import queries
from scanner_spark.deploy import ship
from scanner_spark.frames import FRAME_SCHEMA
from scanner_spark.kernels.image import optical_flow_op

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "100g")
    .config("spark.sql.adaptive.enabled", "true")
    .appName("probe_r15_stencil")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
ship(spark)

old_op = ops_old.Op(optical_flow_op.fn, stencil=[-1, 0], batch=True)


def flow_plan(op):
    frames = queries._doc_frames(spark, sf_dir)
    st = frames.select(
        (F.col("asset_id") % 5).cast("string").alias("stream_id"),
        (F.col("asset_id") / 5).cast("long").alias("idx"),
        F.struct("frame", "height", "width", "channels", "dtype").alias("frame_struct"),
    )
    return op(st, ["frame_struct"], "flow", f"struct<{FRAME_SCHEMA}>").select(
        "stream_id", "idx", F.length(F.col("flow.frame")).alias("nbytes")
    )


def run(op):
    t0 = time.time()
    flow_plan(op).write.format("noop").mode("overwrite").save()
    return time.time() - t0


run(optical_flow_op)  # warm plan/codegen
res = {"old": [], "new": []}
for rep in range(2):
    for which, op in (("old", old_op), ("new", optical_flow_op)):
        dt = run(op)
        res[which].append(round(dt, 2))
        print(f"rep{rep} {which}: {dt:.2f}s", flush=True)
print(json.dumps({"sf_dir": sf_dir, "old_min": min(res["old"]),
                  "new_min": min(res["new"]),
                  "speedup": round(min(res["old"]) / min(res["new"]), 2),
                  "raw": res}))
