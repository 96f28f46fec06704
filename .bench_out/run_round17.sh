#!/bin/bash
# Round-17 frozen-HEAD two-engine sweep (hands-off: no other Spark or
# pytest work may run during these phases).  Per-phase calibration
# fingerprints are recorded inside BENCH_FULL.json by bench.py.
# Methodology identical to round 16 (min-of-2 on every tier in BOTH
# engines, 300 s duck cap as single-pass lower bound).
O=/root/repo/.bench_out
cd /root/repo
git rev-parse HEAD > $O/r17_chain_commit.txt
for sf in 1 3 10; do
  D=/root/repo/.bench_data/sf$sf
  echo "=== r17 spark sf$sf $(date +%T) ==="
  SPARK_GRAFT_SF_DIR=$D timeout 5400 python bench.py > $O/r17_spark_sf$sf.line 2> $O/r17_spark_sf$sf.err \
    && cp BENCH_FULL.json $O/r17_spark_sf$sf.full.json || echo "SPARK sf$sf FAILED rc=$?"
done
for sf in 1 3 10; do
  echo "=== r17 duck sf$sf $(date +%T) ==="
  timeout 14400 python tools/duck_twin_bench.py /root/repo/.bench_data/sf$sf 300 \
    > $O/r17_duck_sf$sf.json 2> $O/r17_duck_sf$sf.err || echo "DUCK sf$sf FAILED rc=$?"
done
echo "=== r17 chain done $(date +%T) ==="
