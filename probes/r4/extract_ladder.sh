#!/bin/bash
# (a) Fused vs per-batch extraction wall-clock on chip (the last fused-
#     dispatch feature without a TPU number).
# (b) Solver-ladder throughput: the zoo at the headline config.
cd /root/repo
RUN=$(ls -d runs_tpu/*8374ae0ef308)
echo "=== extract per-batch $(date +%H:%M:%S)"
{ time timeout 2400 python extract.py --run "$RUN" --timestamps 11 \
    --split test --limit 10000 --output /tmp/feat_unfused.h5 \
    > probes/r4/extract_unfused.out 2>&1 ; } 2> probes/r4/extract_unfused.time
echo "=== extract fused $(date +%H:%M:%S)"
{ time timeout 2400 python extract.py --run "$RUN" --timestamps 11 \
    --split test --limit 10000 --fused --output /tmp/feat_fused.h5 \
    > probes/r4/extract_fused.out 2>&1 ; } 2> probes/r4/extract_fused.time
echo "=== solver ladder $(date +%H:%M:%S)"
: > probes/r4/solver_ladder_r4.jsonl
for M in dopri5 tsit5 bosh3 fehlberg2 adams; do
  echo "=== method=$M $(date +%H:%M:%S)"
  BENCH_DEADLINE_S=2400 timeout 2600 python bench.py --method $M \
      --skip-baseline --repeats 4 2>probes/r4/ladder_$M.err \
      | tail -1 >> probes/r4/solver_ladder_r4.jsonl
done
echo "=== done $(date +%H:%M:%S)"
