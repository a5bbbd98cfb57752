"""On-chip smoke of odeint_event_adjoint: IFT event-time gradients on the
real TPU (f32).  Analytic targets, f32-scale bounds; the solver-side
precision pins (HIGHEST einsums/vdots) are already enforced at the jaxpr
level, so this is an end-to-end hardware check of the composed path:
locate (while_loop) -> adjoint re-solve -> differentiable Newton step.

Run: python probes/r5/event_adjoint_tpu.py   (TPU by default under axon).
"""
import math
import sys
import time

sys.path.insert(0, "/root/repo")

t0 = time.time()
import jax
import jax.numpy as jnp

from neural_ode_features_tpu import utils
from neural_ode_features_tpu.solver import odeint_event_adjoint

utils.enable_tpu_compile_cache()
print(f"[{time.time()-t0:6.1f}s] backend: {jax.devices()[0].platform}",
      flush=True)

# decay hitting time: t* = ln(a/c)/k; dt*/dk = -t*/k, dt*/da = 1/(k a).
k0, a0, c = 1.3, 2.0, 0.5
decay = lambda p, t, y: -p["k"] * y


def tstar(p, y0):
    return odeint_event_adjoint(
        decay, p, y0, 0.0, lambda t, y: y[0] - c,
        t_max=10.0, rtol=1e-6, atol=1e-8,
    ).t_event


p = {"k": jnp.asarray(k0, jnp.float32)}
y0 = jnp.asarray([a0], jnp.float32)
fn = jax.jit(jax.value_and_grad(tstar, argnums=(0, 1)))
val, (g_p, g_y) = jax.block_until_ready(fn(p, y0))
t_true = math.log(a0 / c) / k0
print(f"[{time.time()-t0:6.1f}s] t*={float(val):.6f} (want {t_true:.6f}) "
      f"dt*/dk={float(g_p['k']):.6f} (want {-t_true/k0:.6f}) "
      f"dt*/da={float(g_y[0]):.6f} (want {1/(k0*a0):.6f})", flush=True)
ok = (abs(float(val) - t_true) < 2e-4
      and abs(float(g_p["k"]) - (-t_true / k0)) < 2e-3
      and abs(float(g_y[0]) - 1 / (k0 * a0)) < 2e-3)
print("grad-vs-analytic:", "PASS" if ok else "FAIL", flush=True)

# per-sample: diagonal Jacobian dt*_b/da_b = 1/(k a_b), one batched solve.
a = jnp.asarray([1.0, 2.0, 4.0], jnp.float32)


def tstars(p, av):
    return odeint_event_adjoint(
        decay, p, av[:, None], 0.0, lambda t, y: y[:, 0] - c,
        t_max=20.0, error_control="per_sample", rtol=1e-6, atol=1e-8,
    ).t_event


J = jax.block_until_ready(jax.jit(jax.jacrev(tstars, argnums=1))(p, a))
import numpy as np

want = np.diag(1.0 / (k0 * np.asarray(a)))
dmax = float(np.abs(np.asarray(J) - want).max())
print(f"[{time.time()-t0:6.1f}s] per-sample jacobian max|diff|={dmax:.2e}",
      flush=True)
print("per-sample-jac:", "PASS" if dmax < 2e-3 else "FAIL", flush=True)
print("rc=0", flush=True)
