"""On-chip smoke of odeint_event: hitting times on the real TPU (f32).

Run: python probes/event_tpu_probe.py   (TPU by default under axon).
Writes a PASS/FAIL line per check; analytic targets, f32-scale bounds.
"""
import math, sys, time
sys.path.insert(0, "/root/repo")

t0 = time.time()
import jax, jax.numpy as jnp
from neural_ode_features_tpu import utils
from neural_ode_features_tpu.solver import odeint_event

utils.enable_tpu_compile_cache()
print(f"[{time.time()-t0:6.1f}s] backend: {jax.devices()[0].platform}", flush=True)

fn = jax.jit(lambda y0: odeint_event(
    lambda t, y: -y, y0, 0.0, lambda t, y: y[:, 0] - 1.0,
    t_max=5.0, error_control="per_sample", rtol=1e-5, atol=1e-7))
y0 = jnp.asarray([[2.0], [4.0], [8.0]], jnp.float32)
sol = jax.block_until_ready(fn(y0))
print(f"[{time.time()-t0:6.1f}s] per-sample t* = {sol.t_event.tolist()}", flush=True)
want = [math.log(2), math.log(4), math.log(8)]
ok = all(abs(float(a) - b) < 5e-4 for a, b in zip(sol.t_event, want))
ok &= bool(jnp.all(sol.fired)) and bool(jnp.all(sol.stats.success))
print("per-sample:", "PASS" if ok else f"FAIL (want {want})", flush=True)

g = jax.jit(lambda y0: odeint_event(
    lambda t, y: -y, y0, 0.0, lambda t, y: y[0] - 2.0,
    t_max=-3.0, rtol=1e-5, atol=1e-7))
solb = jax.block_until_ready(g(jnp.asarray([1.0], jnp.float32)))
tb = float(solb.t_event)
print(f"[{time.time()-t0:6.1f}s] backward t* = {tb}", flush=True)
print("backward:", "PASS" if abs(tb + math.log(2)) < 5e-4 else "FAIL", flush=True)
