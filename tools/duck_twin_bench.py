import sys, time, json
sys.path.insert(0, "/root/repo")
import duckdb
import __spark_entry__ as e

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.bench_data/sf1"
con = duckdb.connect()
con.execute("PRAGMA threads=32")
for t in "region nation customer supplier part orders lineitem documents embeddings".split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
# events.ts has shipped as BIGINT epoch-nanos, TIMESTAMP_NS, and plain
# TIMESTAMP across testdata generations — inspect the parquet schema and
# normalize to microsecond TIMESTAMP the same way scanner_spark.io does
ts_type = str(
    con.execute(
        f"SELECT column_type FROM (DESCRIBE SELECT ts FROM "
        f"read_parquet('{SF}/events.parquet'))"
    ).fetchone()[0]
).upper()
if "BIGINT" in ts_type:
    ts_expr = "make_timestamp(ts // 1000)"
elif "TIMESTAMP_NS" in ts_type:
    ts_expr = "CAST(ts AS TIMESTAMP)"
else:
    ts_expr = "ts"
con.execute(
    f"CREATE VIEW events AS SELECT event_id, {ts_expr} AS ts, "
    f"user_id, event_type, value, props FROM read_parquet('{SF}/events.parquet')"
)
times = {}
# min-of-2 absorbs cold-cache noise on sub-second queries; a second pass
# of a 30 s+ query costs more signal than it buys — run it once.  bench.py
# applies the IDENTICAL policy to the Spark side, so per-query ratios always
# compare min-of-2 with min-of-2 (or single-pass with single-pass).
SECOND_PASS_BUDGET_S = 30.0
for name, sql in e.oracle_sql().items():
    t0 = time.time()
    con.execute(sql).fetchall()
    best = time.time() - t0
    if best < SECOND_PASS_BUDGET_S:
        t0 = time.time()
        con.execute(sql).fetchall()
        best = min(best, time.time() - t0)
    times[name] = round(best, 3)
print(json.dumps({"total": round(sum(times.values()), 2), "queries": times}))
