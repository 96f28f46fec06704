#!/bin/bash
# Round-16 frozen-HEAD two-engine sweep (hands-off: no other Spark or
# pytest work may run during these phases).  Per-phase calibration
# fingerprints are recorded inside BENCH_FULL.json by bench.py.
# NEW r16: both benches now min-of-2 the >=30 s tier too (bench.py /
# tools/duck_twin_bench.py default budget = inf) — single samples there
# forced probe adjudication three rounds running.
O=/root/repo/.bench_out
cd /root/repo
git rev-parse HEAD > $O/r16_chain_commit.txt
for sf in 1 3 10; do
  D=/root/repo/.bench_data/sf$sf
  echo "=== r16 spark sf$sf $(date +%T) ==="
  SPARK_GRAFT_SF_DIR=$D timeout 5400 python bench.py > $O/r16_spark_sf$sf.line 2> $O/r16_spark_sf$sf.err \
    && cp BENCH_FULL.json $O/r16_spark_sf$sf.full.json || echo "SPARK sf$sf FAILED rc=$?"
done
for sf in 1 3 10; do
  echo "=== r16 duck sf$sf $(date +%T) ==="
  timeout 14400 python tools/duck_twin_bench.py /root/repo/.bench_data/sf$sf 300 \
    > $O/r16_duck_sf$sf.json 2> $O/r16_duck_sf$sf.err || echo "DUCK sf$sf FAILED rc=$?"
done
echo "=== r16 chain done $(date +%T) ==="
