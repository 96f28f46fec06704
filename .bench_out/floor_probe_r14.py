"""Round-14 adjudication probe (VERDICT r13 #9): does AQE
parallelismFirst=false trim the sub-second relational family's
scheduling floor at sf0.1 without touching at-scale plans?"""
import sys, time, json
sys.path.insert(0, "/root/repo")
mode = sys.argv[1]  # "base" | "coal"
sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
from scanner_spark.session import get_spark
from scanner_spark.deploy import ship
extra = {}
if mode == "coal":
    extra = {"spark.sql.adaptive.coalescePartitions.parallelismFirst": "false"}
spark = get_spark("floorprobe-" + mode, master="local[32]",
                  shuffle_partitions=32, extra_conf=extra)
spark.sparkContext.setLogLevel("ERROR")
ship(spark)
from scanner_spark.queries import QUERIES
names = ["events_pivot", "events_hourly", "events_retention",
         "orders_rollup", "orders_cube", "tpch_q1", "tpch_q6",
         "tpch_q18", "part_brand_stats", "top_customers_per_nation",
         # a heavier control: plans must not regress
         "text_analyze", "docs_tfidf_topk"]
res = {}
for name in names:
    QUERIES[name](spark, sf).count()  # warm (plan+code paths)
for name in names:
    ts = []
    for _ in range(3):
        t0 = time.time()
        QUERIES[name](spark, sf).count()
        ts.append(time.time() - t0)
    res[name] = round(min(ts), 2)
print("RESULT", mode, json.dumps(res))
