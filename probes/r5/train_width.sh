#!/bin/bash
# Adjoint-training MFU/throughput at width (VERDICT r4 #2): the training
# twin of probes/r4/width_sweep.sh.  B per width starts from the r4
# inference VMEM recipe (B*C <~ 64k) shrunk ~3x for the augmented backward
# state [y, a_y, a_theta]; the sweep brackets each width with a 4x B range
# so the collapse point is measured, not assumed.  setsid: the axon tunnel's
# first device fetch is minutes-slow when the client shares a process group
# with a python parent (bench.py's measured lesson).
cd /root/repo
OUT=probes/r5/train_width_r5.jsonl
: > $OUT
run() {
  H=$1; B=$2
  echo "=== hidden=$H B=$B $(date +%H:%M:%S)" >&2
  setsid timeout 1500 python probes/r5/train_width_probe.py \
      --hidden $H --batch-size $B --steps 16 --repeats 3 --tol 1e-3 \
      2>probes/r5/train_h${H}_B${B}.err | tail -1 >> $OUT
  tail -1 $OUT >&2
}
run 64 128    # the flagship training config (train.py defaults)
run 64 256
run 64 512
run 128 64
run 128 128
run 128 256
run 256 32
run 256 64
run 256 128
run 512 32
run 512 64
echo "=== train width sweep done $(date +%H:%M:%S)" >&2
