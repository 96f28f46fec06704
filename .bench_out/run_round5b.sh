#!/bin/bash
# Round-5 perf chain, part 2: re-measure spark sf1/sf3 (emb_kmeans
# empty-partition fix landed mid-chain-1), then duck sf3 and both engines
# at sf10.  sf0.1 and duck sf1 results from chain 1 remain valid.
cd /root/repo
O=/root/repo/.bench_out
SPARK_GRAFT_SF_DIR=/root/repo/.bench_data/sf1 timeout 3600 python bench.py > $O/spark_sf1.line 2> $O/spark_sf1.err && cp BENCH_FULL.json $O/spark_sf1.full.json || echo "SPARK sf1 FAILED"
echo "=== spark sf1 done $(date +%T) ==="
SPARK_GRAFT_SF_DIR=/root/repo/.bench_data/sf3 timeout 3600 python bench.py > $O/spark_sf3.line 2> $O/spark_sf3.err && cp BENCH_FULL.json $O/spark_sf3.full.json || echo "SPARK sf3 FAILED"
echo "=== spark sf3 done $(date +%T) ==="
timeout 5400 python tools/duck_twin_bench.py /root/repo/.bench_data/sf3 300 > $O/duck_sf3.json 2> $O/duck_sf3.err || echo "DUCK sf3 FAILED"
echo "=== duck sf3 done $(date +%T) ==="
SPARK_GRAFT_SF_DIR=/root/repo/.bench_data/sf10 timeout 5400 python bench.py > $O/spark_sf10.line 2> $O/spark_sf10.err && cp BENCH_FULL.json $O/spark_sf10.full.json || echo "SPARK sf10 FAILED"
echo "=== spark sf10 done $(date +%T) ==="
timeout 7200 python tools/duck_twin_bench.py /root/repo/.bench_data/sf10 300 > $O/duck_sf10.json 2> $O/duck_sf10.err || echo "DUCK sf10 FAILED"
echo "=== all done $(date +%T) ==="
