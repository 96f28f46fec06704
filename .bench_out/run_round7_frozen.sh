#!/bin/bash
# Round-7 FROZEN-HEAD sweep (supersedes r7f, whose sf3/sf10 phases mixed
# code states and overlapped test runs): spark suite (90 queries) at
# sf1/sf3/sf10 on commit 046e612, hands-off, plus the DuckDB subset for
# the round's new twin at sf1/sf3 (its sf10 number came from the chain,
# capped at 300 s).
O=/root/repo/.bench_out
cd /root/repo
for sf in 1 3 10; do
  D=/root/repo/.bench_data/sf$sf
  echo "=== frozen spark sf$sf $(date +%T) ==="
  SPARK_GRAFT_SF_DIR=$D timeout 3600 python bench.py > $O/r7g_spark_sf$sf.line 2> $O/r7g_spark_sf$sf.err \
    && cp BENCH_FULL.json $O/r7g_spark_sf$sf.full.json || echo "FROZEN SPARK sf$sf FAILED rc=$?"
done
for sf in 1 3; do
  echo "=== duck new-twin sf$sf $(date +%T) ==="
  timeout 1200 python tools/duck_twin_bench.py /root/repo/.bench_data/sf$sf 300 doc_repeated_passages \
    > $O/r7g_duck_newtwin_sf$sf.json 2> $O/r7g_duck_newtwin_sf$sf.err || echo "DUCK newtwin sf$sf FAILED rc=$?"
done
echo "=== frozen all done $(date +%T) ==="
