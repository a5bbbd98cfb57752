#!/bin/bash
# Single-stream continuous batching (VERDICT r4 #6): does --burst close the
# r4 gap (1 pipelined client 481 img/s vs 8 clients 1,181 img/s on the same
# 64x32-row workload)?  Same artifact/protocol as probes/r4/ragged_batching.sh,
# plus the new burst mode; the 8-client ceiling is re-measured in-session so
# the comparison is same-weather.
cd /root/repo
RUN=$(ls -d runs_tpu/*8374ae0ef308)
ART=/tmp/r5_serve.npexec
if [ ! -d "$ART" ]; then
  echo "=== export artifact $(date +%H:%M:%S)" >&2
  setsid timeout 1800 python tools/export_model.py export-compiled \
      --run "$RUN" --batch 256 --out $ART \
      > probes/r5/serve_export.out 2>&1 || exit 1
fi
echo "=== A: clients=8 rows=32 (ceiling, re-measured) $(date +%H:%M:%S)" >&2
setsid timeout 1200 python tools/serve_client.py --artifact $ART \
    --transport socket --rows 32 --clients 8 --requests 8 \
    > probes/r5/ragged_clients8.out 2>&1
echo "=== C: 1 client pipelined rows=32 (r4 baseline) $(date +%H:%M:%S)" >&2
setsid timeout 1200 python tools/serve_client.py --artifact $ART \
    --transport socket --rows 32 --requests 64 --pipeline \
    > probes/r5/ragged_pipe.out 2>&1
echo "=== D: 1 client BURST rows=32 $(date +%H:%M:%S)" >&2
setsid timeout 1200 python tools/serve_client.py --artifact $ART \
    --transport socket --rows 32 --requests 64 --burst \
    > probes/r5/ragged_burst.out 2>&1
grep -h "aggregate\|dispatches" probes/r5/ragged_*.out >&2
echo "=== ragged burst done $(date +%H:%M:%S)" >&2
