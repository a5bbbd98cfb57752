#!/bin/bash
# Adjoint-training MFU/throughput at width (VERDICT r4 #2): the training
# twin of probes/r4/width_sweep.sh.  B per width starts from the r4
# inference VMEM recipe (B*C <~ 64k) shrunk ~3x for the augmented backward
# state [y, a_y, a_theta]; the sweep brackets each width with a 4x B range
# so the collapse point is measured, not assumed.  setsid: the axon tunnel's
# first device fetch is minutes-slow when the client shares a process group
# with a python parent (bench.py's measured lesson).
#
# STEPS is per-config so each fused whole-epoch dispatch carries seconds of
# on-chip work: a first run at steps=16 measured epoch_s 0.539 at h64/B128
# — the same order as the tunnel dispatch latency, i.e. dispatch-bound, not
# a training measurement.  Images per epoch now target 32k/16k/8k/4k for
# C=64/128/256/512 so dispatch is <10% of every timed epoch.
cd /root/repo
OUT=probes/r5/train_width_r5.jsonl
: > $OUT
run() {
  H=$1; B=$2; S=$3
  echo "=== hidden=$H B=$B steps=$S $(date +%H:%M:%S)" >&2
  setsid timeout 2400 python probes/r5/train_width_probe.py \
      --hidden $H --batch-size $B --steps $S --repeats 3 --tol 1e-3 \
      2>probes/r5/train_h${H}_B${B}.err | tail -1 >> $OUT
  tail -1 $OUT >&2
}
run 64 128 256    # the flagship training config (train.py defaults)
run 64 256 128
run 64 512 64
run 128 64 256
run 128 128 128
run 128 256 64
run 256 32 256
run 256 64 128
run 256 128 64
run 512 32 128
run 512 64 64
echo "=== train width sweep done $(date +%H:%M:%S)" >&2
# Upper-edge bracket (post-hoc): the first 11 configs left C=256/512's best
# B at the top of its bracket — these two measure past the optimum so the
# wide-end collapse point is data, not extrapolation.
#   run 256 256 32
#   run 512 128 32
