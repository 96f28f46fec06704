#!/bin/bash
# Round-7 perf evidence chain: both engines at sf1, sf3, sf10 on CURRENT
# testdata (source /root/testdata unchanged since 2026-08-14 06:49; scaled
# sets from round 5) and CURRENT code — re-records the curve after the
# frame/media oracle additions (checksum columns), the PQ/IVF
# sequential-fold determinism contracts, and B-frame H.264 in the avc1
# fixture.  The DuckDB side now runs 89 twins (was 81) — the new
# frame-kernel twins do per-pixel integer SQL and may hit the 300 s cap
# at sf10 (recorded as capped, not failed).
cd /root/repo
O=/root/repo/.bench_out
for sf in 1 3 10; do
  D=/root/repo/.bench_data/sf$sf
  echo "=== spark sf$sf $(date +%T) ==="
  SPARK_GRAFT_SF_DIR=$D timeout 3600 python bench.py > $O/r7_spark_sf$sf.line 2> $O/r7_spark_sf$sf.err \
    && cp BENCH_FULL.json $O/r7_spark_sf$sf.full.json || echo "SPARK sf$sf FAILED rc=$?"
  echo "=== duck sf$sf $(date +%T) ==="
  CAP=""; [ "$sf" = "3" ] && CAP=300; [ "$sf" = "10" ] && CAP=300
  timeout 5400 python tools/duck_twin_bench.py $D $CAP > $O/r7_duck_sf$sf.json 2> $O/r7_duck_sf$sf.err \
    || echo "DUCK sf$sf FAILED rc=$?"
done
echo "=== all done $(date +%T) ==="
