#!/bin/bash
# Pallas re-race at C>=128 (VERDICT r3 #2): the r3 negative blamed C=64 lane
# padding (64->128); at C=128+ that deficit vanishes — measure both kernels
# against XLA at the widths where the MXU has work.
cd /root/repo
OUT=probes/r4/pallas_rerace_r4.jsonl
: > $OUT
for H in 128 256; do
  for K in pallas fused-rk; do
    echo "=== $K hidden=$H $(date +%H:%M:%S)" >&2
    BENCH_DEADLINE_S=2400 timeout 2600 python bench.py \
        --hidden $H --$K --skip-baseline --repeats 6 \
        2>probes/r4/pallas_${K}_h${H}.err | tail -1 >> $OUT
    tail -1 $OUT >&2
  done
done
echo "=== rerace done $(date +%H:%M:%S)" >&2
