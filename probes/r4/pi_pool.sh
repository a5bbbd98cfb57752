#!/bin/bash
# PI controller on its claimed home turf: the stiffness-limited pool.
# Both controllers in one session (fair within-session comparison).
cd /root/repo
OUT=probes/r4/pi_pool_r4.jsonl
: > $OUT
for C in i pi; do
  echo "=== controller=$C dim=4096 $(date +%H:%M:%S)" >&2
  timeout 2400 python tools/straggler_bench.py --dim 4096 --controller $C \
      2>probes/r4/pi_pool_$C.err | tail -1 >> $OUT
  tail -1 $OUT >&2
done
echo "=== pi pool done $(date +%H:%M:%S)" >&2
