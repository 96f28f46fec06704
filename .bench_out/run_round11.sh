#!/bin/bash
# Round-11 frozen-HEAD two-engine sweep on commit 3e44f26 (hands-off:
# no other Spark/pytest work may run during these phases).
O=/root/repo/.bench_out
cd /root/repo
for sf in 1 3 10; do
  D=/root/repo/.bench_data/sf$sf
  echo "=== r11 spark sf$sf $(date +%T) ==="
  SPARK_GRAFT_SF_DIR=$D timeout 5400 python bench.py > $O/r11_spark_sf$sf.line 2> $O/r11_spark_sf$sf.err \
    && cp BENCH_FULL.json $O/r11_spark_sf$sf.full.json || echo "SPARK sf$sf FAILED rc=$?"
done
for sf in 1 3 10; do
  echo "=== r11 duck sf$sf $(date +%T) ==="
  timeout 14400 python tools/duck_twin_bench.py /root/repo/.bench_data/sf$sf 300 \
    > $O/r11_duck_sf$sf.json 2> $O/r11_duck_sf$sf.err || echo "DUCK sf$sf FAILED rc=$?"
done
echo "=== r11 chain done $(date +%T) ==="
