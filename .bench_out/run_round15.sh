#!/bin/bash
# Round-15 frozen-HEAD two-engine sweep (hands-off: no other Spark or
# pytest work may run during these phases).  Per-phase calibration
# fingerprints are recorded inside BENCH_FULL.json by bench.py.
O=/root/repo/.bench_out
cd /root/repo
git rev-parse HEAD > $O/r15_chain_commit.txt
for sf in 1 3 10; do
  D=/root/repo/.bench_data/sf$sf
  echo "=== r15 spark sf$sf $(date +%T) ==="
  SPARK_GRAFT_SF_DIR=$D timeout 5400 python bench.py > $O/r15_spark_sf$sf.line 2> $O/r15_spark_sf$sf.err \
    && cp BENCH_FULL.json $O/r15_spark_sf$sf.full.json || echo "SPARK sf$sf FAILED rc=$?"
done
for sf in 1 3 10; do
  echo "=== r15 duck sf$sf $(date +%T) ==="
  timeout 14400 python tools/duck_twin_bench.py /root/repo/.bench_data/sf$sf 300 \
    > $O/r15_duck_sf$sf.json 2> $O/r15_duck_sf$sf.err || echo "DUCK sf$sf FAILED rc=$?"
done
echo "=== r15 chain done $(date +%T) ==="
