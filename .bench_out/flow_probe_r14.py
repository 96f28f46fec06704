import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from scanner_spark.session import get_spark
from scanner_spark.deploy import ship
from scanner_spark.queries import QUERIES, _doc_frames
from scanner_spark.frames import FRAME_SCHEMA
from scanner_spark.ops import Op
from scanner_spark.kernels.image import optical_flow_pair

SF = "/root/repo/.bench_data/sf10"
spark = get_spark("flowprobe", master="local[32]", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
ship(spark)

old_op = Op(optical_flow_pair, stencil=[-1, 0], name="OpticalFlowRow")

def run_old():
    frames = _doc_frames(spark, SF)
    st = frames.select(
        (F.col("asset_id") % 5).cast("string").alias("stream_id"),
        (F.col("asset_id") / 5).cast("long").alias("idx"),
        F.struct("frame", "height", "width", "channels", "dtype").alias("frame_struct"),
    )
    return old_op(st, ["frame_struct"], "flow", f"struct<{FRAME_SCHEMA}>")

for name, fn in (("old", run_old),
                 ("new", lambda: QUERIES["frame_optical_flow"](spark, SF)),
                 ("old2", run_old),
                 ("new2", lambda: QUERIES["frame_optical_flow"](spark, SF))):
    t0 = time.time()
    fn().write.format("noop").mode("overwrite").save()
    print("FLOW", name, round(time.time() - t0, 1), flush=True)
