#!/bin/bash
# C=512 measured HBM-bound at B=256 (MFU 0.54 vs 0.68 at C=256). If the
# re-streaming story is right, shrinking B should restore MFU.
cd /root/repo
OUT=probes/r4/b512_sweep_r4.jsonl
: > $OUT
for B in 32 64 128 256; do
  echo "=== hidden=512 B=$B $(date +%H:%M:%S)" >&2
  BENCH_DEADLINE_S=2400 timeout 2600 python bench.py \
      --hidden 512 --batch-size $B --skip-baseline --repeats 6 \
      2>probes/r4/b512_B${B}.err | tail -1 >> $OUT
  tail -1 $OUT >&2
done
echo "=== b512 sweep done $(date +%H:%M:%S)" >&2
