"""Dump .explain("formatted") for named declared queries to files.

Usage: python tools/dump_plans.py <out_dir> <suffix> <query> [<query> ...]

Writes <out_dir>/<query>_<suffix>.txt with the formatted physical plan of
the query built against $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.01).
Run from the repo root whose tree you want to plan (works in a worktree).
"""
import os
import sys

sys.path.insert(0, os.getcwd())

from scanner_spark import queries as Q  # noqa: E402
from scanner_spark.session import get_spark  # noqa: E402


def main() -> None:
    out_dir, suffix, *names = sys.argv[1:]
    os.makedirs(out_dir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = Q.QUERIES[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
