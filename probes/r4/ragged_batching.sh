#!/bin/bash
# Continuous batching on chip: ragged 32-row requests. A/B:
#   A: 8 concurrent clients (cross-connection coalescing into shared batches)
#   B: 1 client, sequential (no queue depth -> one dispatch per request)
#   C: 1 client, pipelined (queue-depth coalescing on a single connection)
# Same total useful rows (64 requests x 32 rows = 2048). The server tail
# line prints requests/rows/dispatches.
cd /root/repo
ART=/tmp/r4_serve.npexec
echo "=== A: clients=8 rows=32 $(date +%H:%M:%S)" >&2
timeout 1200 python tools/serve_client.py --artifact $ART --transport socket \
    --rows 32 --clients 8 --requests 8 > probes/r4/ragged_clients8.out 2>&1
echo "=== B: sequential rows=32 $(date +%H:%M:%S)" >&2
timeout 1200 python tools/serve_client.py --artifact $ART --transport socket \
    --rows 32 --requests 64 > probes/r4/ragged_seq.out 2>&1
echo "=== C: pipelined rows=32 $(date +%H:%M:%S)" >&2
timeout 1200 python tools/serve_client.py --artifact $ART --transport socket \
    --rows 32 --requests 64 --pipeline > probes/r4/ragged_pipe.out 2>&1
echo "=== ragged done $(date +%H:%M:%S)" >&2
