"""Post-precision-pin: Adams (VCABM) accuracy on the real TPU vs CPU.

adams._combine forms the predictor/corrector STATES; until the r4 pin it
ran as a bf16 dot_general on TPU.  Solve a closed-form batch on both
backends and report worst error in tolerance units.
"""
import sys
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

if len(sys.argv) > 1 and sys.argv[1] == "cpu":
    jax.config.update("jax_platforms", "cpu")

from neural_ode_features_tpu.solver import odeint

B, D, tol = 16, 8, 1e-6
lam = np.logspace(-0.5, 1.3, B).astype(np.float32)  # 0.32 .. 20
rng = np.random.default_rng(0)
y0 = rng.normal(size=(B, D)).astype(np.float32)
ts = jnp.asarray([0.0, 1.0], jnp.float32)
lam_d = jnp.asarray(lam)[:, None]

ys, stats = odeint(lambda t, y: -lam_d * y, jnp.asarray(y0), ts,
                   rtol=tol, atol=tol, method="adams",
                   error_control="per_sample", max_steps=4096)
yT = np.asarray(jax.device_get(ys[-1]), np.float64)
exact = y0.astype(np.float64) * np.exp(-lam.astype(np.float64))[:, None]
err = np.max(np.abs(yT - exact) / (tol + tol * np.abs(exact)))
nfe = np.asarray(jax.device_get(stats.nfe))
print(f"{jax.default_backend():4s} adams per-sample worst err_units="
      f"{err:.2f} nfe=[{nfe.min()}, {nfe.max()}]")
