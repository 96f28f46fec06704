import os, sys, time, json
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
# min-of-2 absorbs cold-cache noise; round 16 extends it to the >=30 s
# tier as well (single samples there swung 33-57 s across rounds and kept
# forcing probe adjudication).  bench.py applies the IDENTICAL policy to
# the Spark side, so per-query ratios always compare min-of-2 with
# min-of-2 (capped queries stay single-pass lower bounds).  Override with
# SPARK_GRAFT_SECOND_PASS_BUDGET_S when a run must be cheap.
SECOND_PASS_BUDGET_S = float(
    os.environ.get("SPARK_GRAFT_SECOND_PASS_BUDGET_S", "inf")
)
# optional per-query wall cap (big-SF runs): interrupt from a timer thread
# and record the query as capped instead of blocking the whole run.  With a
# cap set, results are materialized into a dropped TEMP TABLE instead of
# fetchall() — the engine computes every row (DuckDB's natural "noop sink"),
# but a billion-pair result no longer round-trips into Python lists, which
# would measure the client transfer, not the query (Spark's side writes a
# noop sink for the same reason).
CAP_S = float(sys.argv[2]) if len(sys.argv) > 2 else None
capped = {}


def run_once(sql):
    if CAP_S is None:
        con.execute(sql).fetchall()
        return
    import threading

    # done-flag guards the race where the CREATE finishes at ~CAP_S and the
    # timer fires after completion but before cancel(), interrupting the
    # DROP (or a later query) on the shared connection
    done = threading.Event()
    timer = threading.Timer(
        CAP_S, lambda: None if done.is_set() else con.interrupt()
    )
    timer.start()
    try:
        con.execute(f"CREATE OR REPLACE TEMP TABLE _sink AS ({sql})")
    finally:
        done.set()
        timer.cancel()
    con.execute("DROP TABLE IF EXISTS _sink")


def timed(sql):
    """(seconds, was_capped) for one execution; interrupt -> capped, not
    fatal (versions surface it as InterruptException or a generic Error)."""
    t0 = time.time()
    try:
        run_once(sql)
    except duckdb.InterruptException:
        return time.time() - t0, True
    except duckdb.Error as ex:
        if "INTERRUPT" in str(ex).upper():
            return time.time() - t0, True
        raise
    return time.time() - t0, False


# optional arg 3: comma-separated query names (subset re-records after a
# twin is added mid-round, without re-running the whole suite)
ONLY = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None

for name, sql in e.oracle_sql().items():
    if ONLY is not None and name not in ONLY:
        continue
    best, was_capped = timed(sql)
    if was_capped:
        capped[name] = True
        times[name] = round(best, 3)
        continue
    if best < SECOND_PASS_BUDGET_S:
        # the repeat pass gets the SAME cap handling: a variance spike past
        # the wall cap marks the query capped-on-repeat, keeping pass-1 time
        t2, capped2 = timed(sql)
        if not capped2:
            best = min(best, t2)
    times[name] = round(best, 3)
out = {"total": round(sum(times.values()), 2), "queries": times}
if capped:
    out["capped"] = sorted(capped)  # their times are ">= cap" lower bounds
print(json.dumps(out))
