#!/bin/bash
# Round-17 driver-regime drift control (VERDICT r16 "do this" #5):
# interleaved old-HEAD (r16 close, ef59e49 worktree) vs new-HEAD sf0.1
# A/B over the top-10 rows of the r17 baseline plus the two
# round-touched sub-second rows (emb_cosine_pairs, multimodal_decode).
# 3 alternating fresh-session reps per side, 2 noop passes per query per
# session, sha256 calibration recorded per session (qtime_r17.py).
set -u
O=/root/repo/.bench_out
SF=/root/testdata/sf0.1
QS=dedup_jaccard_pairs,emb_kmeans,dedup_keep_best,video_decode_pruned,dedup_simhash_pairs,dedup_minhash_clusters,stream_dedup_minhash_lsh,dedup_minhash_lsh,dedup_simhash_sigs,frame_optical_flow,emb_cosine_pairs,multimodal_decode
export SPARK_GRAFT_CPUS=32
: > /tmp/ab_r17_sf01.jsonl
for rep in 1 2 3; do
  echo "=== rep $rep old $(date +%T) ===" >&2
  python $O/qtime_r17.py /root/r16head $QS $SF 2 2>/dev/null | tail -1 >> /tmp/ab_r17_sf01.jsonl
  echo "=== rep $rep new $(date +%T) ===" >&2
  python $O/qtime_r17.py /root/repo $QS $SF 2 2>/dev/null | tail -1 >> /tmp/ab_r17_sf01.jsonl
done
