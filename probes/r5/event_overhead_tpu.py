"""On-chip cost of event location: odeint_event vs plain odeint.

Same per-sample decay problem on B=256 rows (each row hits its own
threshold at t*_b = ln(a_b/c)/k_b), identical tolerances.  Both sides are
timed as ONE dispatch chaining N independent solves through `lax.scan`
(axon rule: never time per-call), so the printed µs/solve is on-chip work,
not tunnel latency.  The delta is what the event machinery adds on top of
the underlying adaptive solve: the masked per-row done-carry, the
endpoint sign test, and the in-loop bisection refinement (30 iterations on
the dense interpolant, zero extra dynamics evals).

reference: torchdiffeq/_impl/odeint.py odeint_event — UNVERIFIED (empty
mount, SURVEY.md §0); the 2019 reference has no events, so there is no
baseline number to beat — this records the feature's own price.
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

t0 = time.time()
import jax
import jax.numpy as jnp
from jax import lax

from neural_ode_features_tpu import utils
from neural_ode_features_tpu.solver import odeint, odeint_event

utils.enable_tpu_compile_cache()

B, N, REPS = 256, 32, 3
C_THRESH = 0.5
T_MAX = 6.0
rng = np.random.default_rng(0)
ks = jnp.asarray(rng.uniform(0.8, 2.0, size=(B, 1)), jnp.float32)
a0 = jnp.asarray(rng.uniform(1.0, 3.0, size=(B, 1)), jnp.float32)


def f(t, y):
    return -ks * y


def event_fn(t, y):
    return y[:, 0] - C_THRESH


@jax.jit
def chained_event(y0s):
    def body(acc, y0):
        sol = odeint_event(
            f, y0, 0.0, event_fn, t_max=T_MAX, rtol=1e-3, atol=1e-6,
            error_control="per_sample", max_steps=512,
        )
        return acc + jnp.sum(sol.t_event) + jnp.sum(sol.y_event), None

    out, _ = lax.scan(body, jnp.float32(0.0), y0s)
    return out


@jax.jit
def chained_plain(y0s):
    ts = jnp.asarray([0.0, T_MAX], jnp.float32)

    def body(acc, y0):
        ys, _ = odeint(f, y0, ts, rtol=1e-3, atol=1e-6,
                       error_control="per_sample", max_steps=512)
        return acc + jnp.sum(ys[-1]), None

    out, _ = lax.scan(body, jnp.float32(0.0), y0s)
    return out


y0s = a0[None, :, :] + 1e-3 * jnp.asarray(
    rng.normal(size=(N, B, 1)), jnp.float32)

print(f"[{time.time()-t0:6.1f}s] backend={jax.devices()[0].platform} "
      f"B={B} N={N}", flush=True)

rows = {}
for name, fn in (("event", chained_event), ("plain", chained_plain)):
    jax.block_until_ready(fn(y0s))  # compile + warm
    dts = []
    for _ in range(REPS):
        t1 = time.perf_counter()
        jax.block_until_ready(fn(y0s))
        dts.append(time.perf_counter() - t1)
    med = float(np.median(dts)) / N * 1e6
    rows[name] = med
    print(f"[{time.time()-t0:6.1f}s] {name}: {med:9.1f} us/solve "
          f"(band {min(dts)/N*1e6:.1f}-{max(dts)/N*1e6:.1f})", flush=True)

# Correctness spot check while we're on chip: located times vs closed form.
sol = odeint_event(f, a0, 0.0, event_fn, t_max=T_MAX, rtol=1e-3, atol=1e-6,
                   error_control="per_sample", max_steps=512)
t_true = np.log(np.asarray(a0[:, 0]) / C_THRESH) / np.asarray(ks[:, 0])
err = float(np.max(np.abs(np.asarray(sol.t_event) - t_true)))
print(json.dumps({
    "metric": "event_location_overhead_B256",
    "event_us_per_solve": round(rows["event"], 1),
    "plain_us_per_solve": round(rows["plain"], 1),
    "overhead_x": round(rows["event"] / rows["plain"], 3),
    "max_t_event_err": err,
    "all_fired": bool(np.all(np.asarray(sol.fired))),
    "host_load_1min": round(os.getloadavg()[0], 2),
}), flush=True)
print("rc=0", flush=True)
