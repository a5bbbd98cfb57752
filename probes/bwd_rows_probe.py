#!/usr/bin/env python
"""Hardware probe: the rows-layout fused backward kernel on the real TPU.

Checks (VERDICT r2 #3): the custom-VJP pair compiles WITHOUT the 4D
kernel's scoped-VMEM stack OOM and its gradients match jax.vjp of the jnp
dynamics on the same chip.  Emits one status line per phase so a stalled
first contact is diagnosable (axon first-contact can take >300 s).
"""

import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    import jax

    from neural_ode_features_tpu.utils import enable_tpu_compile_cache

    enable_tpu_compile_cache()  # gated (see utils/compile_cache.py)
    import jax.flatten_util
    import jax.numpy as jnp
    import numpy as np

    from neural_ode_features_tpu.kernels.odefunc_pallas import (
        odefunc_pallas_vjp,
    )
    from neural_ode_features_tpu.models import ModelConfig, init_odenet
    from neural_ode_features_tpu.models.odenet import odefunc_apply

    log(f"backend={jax.default_backend()} devices={jax.devices()}")
    cfg = ModelConfig(in_channels=3)
    params = init_odenet(jax.random.PRNGKey(5), cfg)["odefunc"]
    h = jax.random.normal(jax.random.PRNGKey(6), (32, 7, 7, 64), jnp.float32)
    g = jax.random.normal(jax.random.PRNGKey(7), h.shape, jnp.float32)
    t = jnp.asarray(0.43)

    def loss_pallas(p, tt, hh):
        return jnp.sum(odefunc_pallas_vjp(p, tt, hh, 32, False) * g)

    def loss_jnp(p, tt, hh):
        return jnp.sum(odefunc_apply(p, tt, hh, cfg) * g)

    log("compiling jnp grads (reference, strict-f32 matmul/conv)...")
    with jax.default_matmul_precision("float32"):
        rp, rt, rh = jax.jit(jax.grad(loss_jnp, argnums=(0, 1, 2)))(
            params, t, h)
        jax.block_until_ready(rh)
    log("jnp grads done; compiling pallas fwd+bwd kernels (Mosaic, may take "
        "minutes)...")
    t0 = time.time()
    gp, gt, gh = jax.jit(jax.grad(loss_pallas, argnums=(0, 1, 2)))(
        params, t, h)
    jax.block_until_ready(gh)
    log(f"pallas grads done in {time.time()-t0:.0f}s")

    def rel(a, b):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        return float(np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-30))

    fg = jax.flatten_util.ravel_pytree(gp)[0]
    fr = jax.flatten_util.ravel_pytree(rp)[0]
    print("BWD-ROWS-ON-TPU RESULTS", flush=True)
    print(f"  dh   rel_l2={rel(gh, rh):.3e}", flush=True)
    print(f"  dt   pallas={float(gt):+.6e} jnp={float(rt):+.6e} "
          f"rel={abs(float(gt)-float(rt))/(abs(float(rt))+1e-30):.3e}",
          flush=True)
    print(f"  dtheta rel_l2={rel(fg, fr):.3e}", flush=True)

    # per-sample t too
    tb = jnp.linspace(0.1, 0.9, 32)
    gt_b = jax.jit(jax.grad(
        lambda tt: jnp.sum(odefunc_pallas_vjp(params, tt, h, 32, False)
                           * g)))(tb)
    with jax.default_matmul_precision("float32"):
        rt_b = jax.jit(jax.grad(
            lambda tt: jnp.sum(odefunc_apply(params, tt, h, cfg) * g)))(tb)
    print(f"  dt(B,) rel_l2={rel(gt_b, rt_b):.3e}", flush=True)
    ok = (rel(gh, rh) < 1e-3 and rel(fg, fr) < 1e-3
          and rel(gt_b, rt_b) < 1e-2)
    print(f"VERDICT: {'PASS' if ok else 'CHECK-TOLERANCES'}", flush=True)


if __name__ == "__main__":
    main()
