#!/bin/bash
# Population-vs-solo wall-clock (VERDICT r3 #3a): flagship recipe, 3 epochs,
# K=3 population in one process vs 3 solo runs. Steady-state epoch time is
# epochs 2-3 from log.csv (epoch 1 pays compile).
cd /root/repo
R=runs_tpu/r4_pop_timing
rm -rf $R; mkdir -p $R
echo "=== population K=3 $(date +%H:%M:%S)" >&2
timeout 2400 python train.py --dataset synthetic-cifar10 --epochs 3 \
    --lr-decay-epochs 2 --tol 1e-3 --seeds 0,1,2 --runs-dir $R/pop \
    > probes/r4/pop_timing_pop.out 2>&1
for S in 0 1 2; do
  echo "=== solo seed $S $(date +%H:%M:%S)" >&2
  timeout 2400 python train.py --dataset synthetic-cifar10 --epochs 3 \
      --lr-decay-epochs 2 --tol 1e-3 --seed $S --runs-dir $R/solo \
      > probes/r4/pop_timing_solo$S.out 2>&1
done
echo "=== pop timing done $(date +%H:%M:%S)" >&2
grep -r "" $R/*/*/log.csv 2>/dev/null | head -40 >&2
