#!/bin/bash
# Round-4 TPU measurement campaign, part 2 (VERDICT r3 #3):
#   (a) population-vs-solo training wall-clock   -> pop_timing.sh
#   (b) fused vs per-tol tolerance sweep         -> sweep_*.out + /usr/bin/time
#   (c) serving: socket vs files, --clients N    -> serve_*.out
# Runs strictly sequentially (one chip, one CPU).
set -x
cd /root/repo

./probes/r4/pop_timing.sh 2>probes/r4/pop_timing.log

echo "=== sweep per-tol $(date +%H:%M:%S)" >&2
/usr/bin/time -v timeout 2400 python sweep.py --tols 1e-1,1e-2,1e-3,1e-4 \
    --batch-size 256 > probes/r4/sweep_unfused.out 2>&1
echo "=== sweep fused $(date +%H:%M:%S)" >&2
/usr/bin/time -v timeout 2400 python sweep.py --tols 1e-1,1e-2,1e-3,1e-4 \
    --batch-size 256 --fused > probes/r4/sweep_fused.out 2>&1

RUN=$(ls -d runs_tpu/*8374ae0ef308)
ART=/tmp/r4_serve.npexec
rm -rf $ART
echo "=== export artifact $(date +%H:%M:%S)" >&2
timeout 1800 python tools/export_model.py export-compiled --run "$RUN" \
    --batch 256 --out $ART > probes/r4/serve_export.out 2>&1

echo "=== serving files pipeline $(date +%H:%M:%S)" >&2
timeout 1200 python tools/serve_client.py --artifact $ART --requests 16 \
    --pipeline > probes/r4/serve_files_pipe.out 2>&1
echo "=== serving files latency $(date +%H:%M:%S)" >&2
timeout 1200 python tools/serve_client.py --artifact $ART --requests 16 \
    > probes/r4/serve_files_lat.out 2>&1
echo "=== serving socket pipeline $(date +%H:%M:%S)" >&2
timeout 1200 python tools/serve_client.py --artifact $ART --requests 16 \
    --transport socket --pipeline > probes/r4/serve_socket_pipe.out 2>&1
echo "=== serving socket latency $(date +%H:%M:%S)" >&2
timeout 1200 python tools/serve_client.py --artifact $ART --requests 16 \
    --transport socket > probes/r4/serve_socket_lat.out 2>&1
for N in 1 4 8; do
  echo "=== serving socket clients=$N $(date +%H:%M:%S)" >&2
  timeout 1200 python tools/serve_client.py --artifact $ART --requests 8 \
      --transport socket --clients $N > probes/r4/serve_clients$N.out 2>&1
done
echo "=== campaign2 done $(date +%H:%M:%S)" >&2
