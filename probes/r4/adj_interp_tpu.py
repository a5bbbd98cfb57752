"""Post-precision-pin check: interpolated-adjoint gradients on the real TPU.

The interpolated adjoint reads y(t) during the backward solve from the
forward's stored dense coefficients (solver/dense.py).  Until the r4
precision pin, that coefficient einsum ran as a bf16 dot_general on TPU.
Measure gradient agreement on-chip: interpolated vs reintegrate vs direct
(scan_remat) on a small nonlinear batched problem.
"""
import sys
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

if len(sys.argv) > 1 and sys.argv[1] == "cpu":
    jax.config.update("jax_platforms", "cpu")

from neural_ode_features_tpu.solver import odeint, odeint_adjoint

B, N = 8, 16
rng = np.random.default_rng(1)
y0 = jnp.asarray(rng.normal(size=(B, N)).astype(np.float32))
W = jnp.asarray(rng.normal(size=(N,)).astype(np.float32))
ts = jnp.asarray([0.0, 1.0], jnp.float32)


def func(params, t, y):
    # purely elementwise dynamics: any dot in the solve belongs to the
    # solver machinery, so solver-side bf16 noise is isolated from the
    # model's own (intentional) bf16-multiply convs/matmuls.
    return params[None, :] * jnp.tanh(y)


def loss_adj(params, mode):
    ys, _ = odeint_adjoint(func, params, y0, ts, rtol=1e-6, atol=1e-8,
                           adjoint_mode=mode)
    return jnp.sum(ys[-1] ** 2)


def loss_direct(params):
    ys, _ = odeint(lambda t, y: func(params, t, y), y0, ts,
                   rtol=1e-6, atol=1e-8, unroll="scan_remat",
                   max_steps=256)
    return jnp.sum(ys[-1] ** 2)


g_direct = jax.jit(jax.grad(loss_direct))(W)
g_reint = jax.jit(jax.grad(lambda p: loss_adj(p, "reintegrate")))(W)
g_interp = jax.jit(jax.grad(lambda p: loss_adj(p, "interpolated")))(W)

scale = jnp.max(jnp.abs(g_direct))
for name, g in [("reintegrate", g_reint), ("interpolated", g_interp)]:
    rel = float(jnp.max(jnp.abs(g - g_direct)) / scale)
    print(f"{jax.default_backend():4s} {name:12s} max rel diff vs direct: "
          f"{rel:.2e}")
print(f"{jax.default_backend():4s} interp vs reint: "
      f"{float(jnp.max(jnp.abs(g_interp - g_reint)) / scale):.2e}")
