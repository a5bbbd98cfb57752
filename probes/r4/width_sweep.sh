#!/bin/bash
# MFU-vs-width sweep (VERDICT r3 #2): one supervised bench per width,
# TPU, skip the CPU oracle (vs_baseline is not the question here; MFU and
# img/s are). JSON lines accumulate in width_sweep_r4.jsonl.
cd /root/repo
OUT=probes/r4/width_sweep_r4.jsonl
: > $OUT
for H in 64 128 256 512; do
  echo "=== hidden=$H $(date +%H:%M:%S)" >&2
  BENCH_DEADLINE_S=2400 timeout 2600 python bench.py \
      --hidden $H --skip-baseline --repeats 6 2>probes/r4/width_h${H}.err \
    | tail -1 >> $OUT
  tail -1 $OUT >&2
done
echo "=== sweep done $(date +%H:%M:%S)" >&2
