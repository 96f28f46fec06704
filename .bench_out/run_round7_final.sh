#!/bin/bash
# Round-7 FINAL-code spark re-record: the chain's spark sf10 phase was
# contaminated by concurrent test runs (+194 s vs r6), and the chain ran
# pre-FLAC/pre-doc_repeated_passages code (89 queries).  This waits for
# the chain (duck sf10) to finish, then re-runs the spark suite at all
# three scales on final HEAD, hands-off, plus the new twin's DuckDB
# subset timing.
O=/root/repo/.bench_out
while kill -0 6382 2>/dev/null; do sleep 30; done
cd /root/repo
for sf in 1 3 10; do
  D=/root/repo/.bench_data/sf$sf
  echo "=== final spark sf$sf $(date +%T) ==="
  SPARK_GRAFT_SF_DIR=$D timeout 3600 python bench.py > $O/r7f_spark_sf$sf.line 2> $O/r7f_spark_sf$sf.err \
    && cp BENCH_FULL.json $O/r7f_spark_sf$sf.full.json || echo "FINAL SPARK sf$sf FAILED rc=$?"
done
for sf in 1 3 10; do
  echo "=== duck new-twin sf$sf $(date +%T) ==="
  timeout 1200 python tools/duck_twin_bench.py /root/repo/.bench_data/sf$sf 300 doc_repeated_passages \
    > $O/r7f_duck_newtwin_sf$sf.json 2> $O/r7f_duck_newtwin_sf$sf.err || echo "DUCK newtwin sf$sf FAILED rc=$?"
done
echo "=== final all done $(date +%T) ==="
