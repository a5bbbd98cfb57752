import sys
sys.path.insert(0, '/root/repo')
import numpy as np
import jax, jax.numpy as jnp
if len(sys.argv) > 1 and sys.argv[1] == 'cpu':
    jax.config.update("jax_platforms", "cpu")
from neural_ode_features_tpu.solver import odeint

B, D, tol = 8, 4, 1e-6
lam = np.logspace(0, np.log10(200.0), B).astype(np.float32)
rng = np.random.default_rng(0)
y0 = rng.normal(size=(B, D)).astype(np.float32)
ts = jnp.asarray([0.0, 1.0], jnp.float32)
lam_d = jnp.asarray(lam)[:, None]

def f(t, y):
    return -lam_d * y

exact = y0.astype(np.float64) * np.exp(-lam.astype(np.float64))[:, None]

for label, kw in [
    ("per_sample", dict(error_control="per_sample")),
    ("global", dict(error_control="global")),
    ("rk4 fixed 512", dict(method="rk4", steps_per_interval=512)),
]:
    ys, stats = odeint(f, jnp.asarray(y0), ts, rtol=tol, atol=tol,
                       max_steps=4096, **kw)
    yT = np.asarray(jax.device_get(ys[-1]), np.float64)
    err = np.max(np.abs(yT - exact) / (tol + tol * np.abs(exact)), axis=1)
    nfe = np.asarray(jax.device_get(stats.nfe)).reshape(-1)
    print(f"{jax.default_backend():4s} {label:14s} err_units per row:",
          np.array2string(err, precision=1, suppress_small=True),
          "nfe:", nfe[:B])
