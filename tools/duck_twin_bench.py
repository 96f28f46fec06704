import sys, time, json
sys.path.insert(0, "/root/repo")
import duckdb
import __spark_entry__ as e

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.bench_data/sf1"
con = duckdb.connect()
con.execute("PRAGMA threads=32")
for t in "region nation customer supplier part orders lineitem documents embeddings".split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
# sf1 events.ts is BIGINT epoch-nanos; present as microsecond timestamp like
# the TIMESTAMP_NS->micros normalization both engines apply at sf0.1
con.execute(
    f"CREATE VIEW events AS SELECT event_id, make_timestamp(ts // 1000) AS ts, "
    f"user_id, event_type, value, props FROM read_parquet('{SF}/events.parquet')"
)
times = {}
for name, sql in e.oracle_sql().items():
    best = None
    for _ in range(2):
        t0 = time.time()
        con.execute(sql).fetchall()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    times[name] = round(best, 3)
print(json.dumps({"total": round(sum(times.values()), 2), "queries": times}))
