#!/bin/bash
# Round-9 targeted at-scale chain: the three re-planned queries at
# sf1/sf3/sf10, plus the exact repeated-passages path at sf10 for a
# same-machine before/after row.  Code frozen at the commit recorded below.
set -u
cd /root/repo
OUT=.bench_out/targeted_r9.jsonl
: > "$OUT"
echo "{\"commit\": \"$(git rev-parse HEAD)\", \"start\": \"$(date -u +%FT%TZ)\"}" >> "$OUT"
QS="doc_lm_familiarity,doc_repeated_passages_winnowed,emb_knn_ivf"
for SF in sf1 sf3 sf10; do
  python .bench_out/targeted_r9.py ".bench_data/$SF" "$QS" 2 \
    >> "$OUT" 2> ".bench_out/targeted_r9_$SF.err"
done
# exact path at sf10: 1 pass only (it is the 262 s oracle-only variant)
python .bench_out/targeted_r9.py ".bench_data/sf10" "doc_repeated_passages" 1 \
  >> "$OUT" 2> ".bench_out/targeted_r9_sf10_exact.err"
echo "{\"end\": \"$(date -u +%FT%TZ)\"}" >> "$OUT"
