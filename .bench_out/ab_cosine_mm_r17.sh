#!/bin/bash
# Round-17 sf10 interleaved A/B for the cosine mega-bucket guard and the
# multimodal entropy-tier work: old = r16-close worktree (ef59e49), new =
# HEAD; alternating fresh sessions, 2 noop passes each, calibration per
# session.  Results appended to /tmp/ab_cosine_mm_r17.jsonl (one old rep
# from the interrupted first session is already there).
set -u
O=/root/repo/.bench_out
SF=/root/repo/.bench_data/sf10
QS=multimodal_decode,emb_cosine_pairs
export SPARK_GRAFT_CPUS=32
for rep in 1 2 3; do
  echo "=== rep $rep new $(date +%T) ===" >&2
  python $O/qtime_r17.py /root/repo $QS $SF 2 2>/dev/null | tail -1 >> /tmp/ab_cosine_mm_r17.jsonl
  if [ $rep -lt 3 ]; then
    echo "=== rep $rep old $(date +%T) ===" >&2
    python $O/qtime_r17.py /root/r16head $QS $SF 2 2>/dev/null | tail -1 >> /tmp/ab_cosine_mm_r17.jsonl
  fi
done
