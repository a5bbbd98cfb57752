#!/usr/bin/env python
"""Example: train → export → serve, the TPU-native deployment loop.

Trains a tiny ODE-Net for a handful of steps, AOT-exports the inference
function with ``jax.export`` (StableHLO + calling convention in one blob),
then plays the serving process: deserialize the artifact IN A WORLD WITHOUT
THE MODEL CODE (no config, no param pytrees, no tracing) and run it,
checking it agrees with the live model bit-for-bit.

This is the jax analogue of the torch.jit.trace/ONNX hand-off the reference
leaves to its consumers (reference: none — SURVEY.md §2.3; the full CLI is
tools/export_model.py).

For serving WITHOUT a Python interpreter at all, the next step up is the
native C++ host: ``tools/export_model.py export-compiled`` writes a
PJRT-serialized-executable artifact and ``native/pjrt_serve`` (make -C
native) dlopens the PJRT plugin and executes it directly — see
probes/native_serve_probe.sh for the hardware-verified loop.

Runs anywhere:  python examples/deploy_artifact.py  (add --cpu off-TPU).
"""

import argparse
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from jax import export as jexport

    from neural_ode_features_tpu.models import (
        ModelConfig, init_odenet, odenet_logits,
    )

    # -- "training" (a few steps is plenty for the demo) --------------------
    cfg = ModelConfig(in_channels=1, tol=1e-2, error_control="per_sample")
    params = init_odenet(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 28, 28, 1),
                          jnp.float32)
    y = jnp.arange(16) % 10

    @jax.jit
    def loss_fn(p):
        # adjoint=True: the adaptive while_loop is not reverse-differentiable
        # directly; training always rides the adjoint's custom VJP.
        logits, _ = odenet_logits(p, x, cfg, adjoint=True)
        return -jnp.mean(jnp.sum(
            jax.nn.log_softmax(logits) * jax.nn.one_hot(y, 10), -1))

    grad = jax.jit(jax.grad(loss_fn))
    for step in range(3):
        params = jax.tree.map(lambda a, g: a - 0.05 * g, params,
                              grad(params))
    print(f"trained 3 steps; loss {float(loss_fn(params)):.4f}")

    # -- export: one self-contained blob ------------------------------------
    def infer(batch):
        logits, _ = odenet_logits(params, batch, cfg, adjoint=False)
        return logits

    exported = jexport.export(jax.jit(infer))(
        jax.ShapeDtypeStruct((16, 28, 28, 1), jnp.float32))
    blob = exported.serialize()
    artifact = Path(tempfile.gettempdir()) / "odenet_demo.nodeexport"
    artifact.write_bytes(blob)
    print(f"exported {len(blob)/1e6:.2f} MB StableHLO artifact "
          f"(platforms={list(exported.platforms)}) -> {artifact}")

    # -- the "serving process": artifact only, no model code ----------------
    served = jexport.deserialize(artifact.read_bytes())
    batch = np.asarray(x)  # pretend this arrived over the wire
    logits_served = np.asarray(served.call(batch))

    logits_live = np.asarray(infer(x))
    diff = float(np.abs(logits_served - logits_live).max())
    agree = float((logits_served.argmax(-1) == logits_live.argmax(-1)).mean())
    print(f"served logits shape {logits_served.shape}; "
          f"max|served - live| = {diff:.2e}; argmax agreement {agree:.0%}")
    assert agree == 1.0
    print("OK: the artifact serves the model with zero framework code")


if __name__ == "__main__":
    main()
