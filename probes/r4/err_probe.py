import sys
sys.path.insert(0, '/root/repo')
import numpy as np
import jax, jax.numpy as jnp
if len(sys.argv) > 1 and sys.argv[1] == 'cpu':
    jax.config.update("jax_platforms", "cpu")
from neural_ode_features_tpu.solver import odeint

B, D, tol = 256, 64, 1e-6
lam = np.logspace(0, np.log10(200.0), B).astype(np.float32)
rng = np.random.default_rng(0)
y0 = rng.normal(size=(B, D)).astype(np.float32)
ts = jnp.asarray([0.0, 1.0], jnp.float32)
lam_d = jnp.asarray(lam)[:, None]

def f(t, y):
    return -lam_d * y

ys, stats = odeint(f, jnp.asarray(y0), ts, rtol=tol, atol=tol,
                   error_control="per_sample", max_steps=4096)
yT = np.asarray(jax.device_get(ys[-1]), np.float64)
exact = y0.astype(np.float64) * np.exp(-lam.astype(np.float64))[:, None]
err_units = np.max(np.abs(yT - exact) / (tol + tol * np.abs(exact)), axis=1)
nfe = np.asarray(jax.device_get(stats.nfe))
k = int(np.argmax(err_units))
print(f"backend={jax.default_backend()} worst row k={k} lam={lam[k]:.2f} "
      f"err_units={err_units[k]:.1f} nfe={nfe[k]}")
top = np.argsort(err_units)[-5:][::-1]
for i in top:
    print(f"  lam={lam[i]:8.2f} err={err_units[i]:10.2f} nfe={nfe[i]:4d} |yT|max={np.abs(yT[i]).max():.3e}")
