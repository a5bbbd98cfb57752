#!/bin/bash
# bf16 dynamics across widths: the C>=512 regime measured HBM-bound in f32,
# so bf16 activations (half the traffic) are the next perf lever.
cd /root/repo
OUT=probes/r4/bf16_width_r4.jsonl
: > $OUT
for H in 64 256 512; do
  echo "=== bf16 hidden=$H $(date +%H:%M:%S)" >&2
  BENCH_DEADLINE_S=2400 timeout 2600 python bench.py \
      --hidden $H --bf16 --skip-baseline --repeats 6 \
      2>probes/r4/bf16_h${H}.err | tail -1 >> $OUT
  tail -1 $OUT >&2
done
echo "=== bf16 width done $(date +%H:%M:%S)" >&2
