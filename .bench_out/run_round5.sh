#!/bin/bash
# Round-5 perf evidence chain: both engines at sf0.1, sf1, sf3, sf10 on
# CURRENT testdata (regenerated 2026-08-14 06:49) and CURRENT code.
cd /root/repo
O=/root/repo/.bench_out
for sf in 0.1 1 3 10; do
  if [ "$sf" = "0.1" ]; then D=/root/testdata/sf0.1; else D=/root/repo/.bench_data/sf$sf; fi
  echo "=== spark sf$sf $(date +%T) ==="
  SPARK_GRAFT_SF_DIR=$D timeout 3600 python bench.py > $O/spark_sf$sf.line 2> $O/spark_sf$sf.err \
    && cp BENCH_FULL.json $O/spark_sf$sf.full.json || echo "SPARK sf$sf FAILED rc=$?"
  echo "=== duck sf$sf $(date +%T) ==="
  CAP=""; [ "$sf" = "3" ] && CAP=300; [ "$sf" = "10" ] && CAP=300
  timeout 5400 python tools/duck_twin_bench.py $D $CAP > $O/duck_sf$sf.json 2> $O/duck_sf$sf.err \
    || echo "DUCK sf$sf FAILED rc=$?"
done
echo "=== all done $(date +%T) ==="
