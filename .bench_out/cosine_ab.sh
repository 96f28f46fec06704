#!/bin/bash
# Interleaved old-vs-new A/B for emb_cosine_pairs at sf10: alternating
# fresh-session runs so both sides sample the same box phases.  Each
# cosine_runner run = 2 noop passes + a row count (row counts must match).
set -u
SF=/root/repo/.bench_data/sf10
O=/root/repo/.bench_out
export SPARK_GRAFT_CPUS=32
export COSINE_SKIP_COUNT=${COSINE_SKIP_COUNT:-1}
for rep in 1 2 3; do
  echo "=== rep $rep old $(date +%T) ==="
  python $O/cosine_runner.py /tmp/r15head $SF 2>/dev/null | tail -1
  echo "=== rep $rep new $(date +%T) ==="
  python $O/cosine_runner.py /root/repo $SF 2>/dev/null | tail -1
done
