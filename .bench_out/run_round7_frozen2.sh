#!/bin/bash
# Round-7 frozen-HEAD sweep, part 2 (resume): the part-1 launcher died with
# its parent session mid-sf3. sf1 completed cleanly (r7g_spark_sf1.*);
# this script reruns sf3 and sf10 plus the DuckDB subset for the round's
# new twin at sf1/sf3. Same frozen commit 046e612, hands-off.
O=/root/repo/.bench_out
cd /root/repo
for sf in 3 10; do
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
echo "=== frozen2 all done $(date +%T) ==="
