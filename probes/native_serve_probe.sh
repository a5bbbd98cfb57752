#!/bin/sh
# Hardware verification of the native C++ serving host (native/pjrt_serve)
# against the real TPU. The CPU pytest suite cannot run the execute path
# (jaxlib ships no CPU PJRT-C-API plugin .so), so this probe is the
# end-to-end check; its log is committed as probes/native_serve_probe.log.
#
# Steps: build the runner, AOT-export a .npexec artifact from the
# committed flagship checkpoint on the axon TPU backend, then run the
# C++ host with --selftest (parity vs the live model's logits on the
# artifact's deterministic sample input) and --bench (per-request
# serving latency, fetch-synced).
set -ex
cd "$(dirname "$0")/.."

make -C native TF_INC="$(python -c 'import tensorflow,os;print(os.path.join(os.path.dirname(tensorflow.__file__),"include"))')"

RUN=$(ls -d runs_tpu/*8374ae0ef308)
ART=${ART:-/tmp/native_probe.npexec}
test -d "$ART" || timeout 900 python tools/export_model.py export-compiled \
    --run "$RUN" --batch 256 --out "$ART"

timeout 900 ./native/pjrt_serve "$ART" --selftest --bench 16
