#!/bin/bash
# Fused vs per-tol tolerance-sweep wall-clock (VERDICT r3 #3b).
# /usr/bin/time is absent on this box; use bash's `time` keyword.
cd /root/repo
echo "=== sweep per-tol $(date +%H:%M:%S)"
{ time timeout 2400 python sweep.py --tols 1e-1,1e-2,1e-3,1e-4 \
    --batch-size 256 > probes/r4/sweep_unfused.out 2>&1 ; } 2> probes/r4/sweep_unfused.time
echo "=== sweep fused $(date +%H:%M:%S)"
{ time timeout 2400 python sweep.py --tols 1e-1,1e-2,1e-3,1e-4 \
    --batch-size 256 --fused > probes/r4/sweep_fused.out 2>&1 ; } 2> probes/r4/sweep_fused.time
echo "=== done $(date +%H:%M:%S)"
