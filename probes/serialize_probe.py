#!/usr/bin/env python
"""Probe: can a compiled axon-TPU executable be serialized (for the C++
PJRT serving runner) and deserialized back?

Checks, in order:
  1. jax.jit(...).lower(x).compile() on the axon backend
  2. obtain the underlying xla_client.LoadedExecutable
  3. .serialize() -> bytes (the PJRT_Executable_Serialize C API)
  4. client.deserialize_executable(...) round trip in-process
  5. execute the deserialized executable and compare

Run: timeout 900 python probes/serialize_probe.py
"""
import time

t0 = time.time()


def log(msg):
    print(f"[{time.time()-t0:7.1f}s] {msg}", flush=True)


import jax
import jax.numpy as jnp

import sys

sys.path.insert(0, "/root/repo")
from neural_ode_features_tpu.utils import enable_tpu_compile_cache

enable_tpu_compile_cache()  # gated (see utils/compile_cache.py)

log(f"devices: {jax.devices()}")

f = jax.jit(lambda x: jnp.tanh(x @ x.T) * 2.0 + 1.0)
x = jnp.ones((8, 8), jnp.float32)
lowered = f.lower(x)
log("lowered")
comp = lowered.compile()
log(f"compiled: {type(comp)}")

# Find the runtime executable.
exe = None
for path in ("runtime_executable",):
    if hasattr(comp, path):
        try:
            exe = getattr(comp, path)()
            log(f"comp.{path}() -> {type(exe)}")
            break
        except Exception as e:  # noqa: BLE001
            log(f"comp.{path}() failed: {e!r}")
if exe is None:
    inner = getattr(comp, "_executable", None)
    log(f"comp._executable = {type(inner)}")
    exe = getattr(inner, "xla_executable", None)
    log(f"xla_executable = {type(exe)}")

blob = exe.serialize()
log(f"serialize() -> {type(blob)}, {len(blob)} bytes")
with open("/tmp/probe_exec.bin", "wb") as fh:
    fh.write(blob)

client = jax.devices()[0].client
log(f"client = {type(client)}")
exe2 = client.deserialize_executable(blob, [jax.devices()[0]])
log(f"deserialize_executable -> {type(exe2)}")

y_ref = comp(x)
dev = jax.devices()[0]
xb = jax.device_put(x, dev)
outs = exe2.execute_sharded([xb])
log(f"execute -> {type(outs)}")
arrs = outs.disassemble_into_single_device_arrays()
y2 = jnp.asarray(arrs[0][0])
import numpy as np

d = float(np.max(np.abs(np.asarray(y_ref) - np.asarray(y2))))
log(f"max|diff| vs jit path = {d}")
assert d == 0.0, d
log("OK: serialize/deserialize/execute round trip works on axon")
