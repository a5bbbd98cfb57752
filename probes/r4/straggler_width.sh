#!/bin/bash
# VERDICT r3 #6: per-sample control + NFE-bucketing vs batch-global,
# on the chip, at state sizes where per-step work dominates dispatch.
cd /root/repo
OUT=probes/r4/straggler_width_r4.jsonl
: > $OUT
for D in 64 1024 4096 16384; do
  echo "=== dim=$D $(date +%H:%M:%S)" >&2
  timeout 2400 python tools/straggler_bench.py --dim $D \
      2>probes/r4/straggler_d$D.err | tail -1 >> $OUT
  tail -1 $OUT >&2
done
echo "=== straggler width done $(date +%H:%M:%S)" >&2
