#!/usr/bin/env python
"""Time the fused dopri5 RK-*step* Pallas kernel vs the jnp step on TPU.

This is the decisive measurement for VERDICT r2 #2: one whole embedded
dopri5 step attempt (6 FSAL dynamics evals + stage sums + embedded error
norm, k's VMEM-resident — kernels/rk_step_pallas.py) against the
production jnp path's equivalent (`_rk_attempt` + `_error_ratio` around the
split-ConcatConv dynamics).  The conv-level probe (conv_probe.py) races
isolated conv strategies; this one prices the whole step, which is where
the ~70 (B, N) HBM traversals of RK linear algebra live (RESULTS.md
"Decomposition").

Usage:  python probes/rk_step_probe.py [--no-jnp] [strategy:tile:precision ...]
  e.g.  python probes/rk_step_probe.py im2col:32:bf16 seq9:32:bf16

Timing: chained lax.scan slope (long vs short chain), best of REPS — the
0.6 s tunnel dispatch constant cancels exactly.  Results append to
probes/rk_step_probe.log.
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, "/root/repo")
from neural_ode_features_tpu.utils import enable_tpu_compile_cache  # noqa: E402

enable_tpu_compile_cache()  # gated (see utils/compile_cache.py)

from neural_ode_features_tpu.kernels.rk_step_pallas import (  # noqa: E402
    make_fused_dopri5_step,
)
from neural_ode_features_tpu.models.common import ModelConfig  # noqa: E402
from neural_ode_features_tpu.models.odenet import (  # noqa: E402
    init_odefunc,
    odefunc_apply,
)
from neural_ode_features_tpu.solver.runge_kutta import (  # noqa: E402
    _error_ratio,
    _rk_attempt,
)
from neural_ode_features_tpu.solver.tableau import (  # noqa: E402
    ADAPTIVE_TABLEAUS,
)

LOG = "/root/repo/probes/rk_step_probe.log"
B, H, W, C = 256, 7, 7, 64
N = H * W * C
RTOL = ATOL = 1e-3
ITERS = 300
ITERS_SHORT = 50
REPS = 5


def log(msg):
    line = f"{time.strftime('%H:%M:%S')} {msg}"
    print(line, flush=True)
    with open(LOG, "a") as f:
        f.write(line + "\n")


def build_inputs():
    cfg = ModelConfig(hidden=C, groups=32, tol=RTOL)
    params = init_odefunc(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    y0 = jnp.asarray(rng.normal(size=(B, N)).astype(np.float32) * 0.5)
    t0 = jnp.full((B,), 0.1, jnp.float32)
    dt = jnp.full((B,), 0.05, jnp.float32)
    return cfg, params, t0, dt, y0


def jnp_step(cfg, params):
    tab = ADAPTIVE_TABLEAUS["dopri5"]

    def func(t, y_flat):
        h = y_flat.reshape(B, H, W, C)
        return odefunc_apply(params, t, h, cfg).reshape(B, N)

    def step(t0, dt, y0, f0):
        y1, err, f1, _, parts_fn = _rk_attempt(
            tab, func, t0, dt, y0, f0, jnp.float32)
        ratio = _error_ratio(err, y0, y1, RTOL, ATOL, None)
        y_mid = parts_fn()[2]
        return y1, f1, y_mid, ratio

    return func, step


def timed_step(step, func, t0, dt, y0, label):
    f0 = func(t0, y0)

    def make_loop(n):
        @jax.jit
        def loop(t0, dt, y, f):
            def body(carry, _):
                y, f = carry
                y1, f1, y_mid, ratio = step(t0, dt, y, f)
                # Data-dependence without divergence: decay toward y0/f0.
                y_next = y + 1e-6 * (y1 - y) + 1e-9 * jnp.sum(ratio)
                f_next = f + 1e-6 * (f1 - f) + 1e-9 * y_mid * 0.0
                return (y_next, f_next), None

            (y_out, f_out), _ = lax.scan(body, (y, f), None, length=n)
            return jnp.mean(y_out) + jnp.mean(f_out)

        return loop

    t_start = time.perf_counter()
    loop_long = make_loop(ITERS)
    loop_short = make_loop(ITERS_SHORT)
    try:
        float(jax.device_get(loop_long(t0, dt, y0, f0)))
        float(jax.device_get(loop_short(t0, dt, y0, f0)))
    except Exception as e:
        log(f"{label}: FAILED compile/run: {str(e)[:400]}")
        with open(LOG + ".err", "a") as f:
            f.write(f"=== {time.strftime('%H:%M:%S')} {label} ===\n"
                    f"{type(e).__name__}: {e}\n\n")
        return None
    compile_s = time.perf_counter() - t_start

    best_long = best_short = float("inf")
    for _ in range(REPS):
        t1 = time.perf_counter()
        float(jax.device_get(loop_long(t0, dt, y0, f0)))
        best_long = min(best_long, time.perf_counter() - t1)
        t1 = time.perf_counter()
        float(jax.device_get(loop_short(t0, dt, y0, f0)))
        best_short = min(best_short, time.perf_counter() - t1)
    us = (best_long - best_short) / (ITERS - ITERS_SHORT) * 1e6
    log(f"{label}: {us:9.1f} us/step  (long {best_long:.3f}s "
        f"short {best_short:.3f}s compile {compile_s:.0f}s)")
    return us


def check_against_jnp(cfg, params, fused, t0, dt, y0):
    func, step = jnp_step(cfg, params)
    f0 = func(t0, y0)
    ref = jax.jit(step)(t0, dt, y0, f0)
    got = jax.jit(fused)(t0, dt, y0, f0)
    names = ["y1", "f1", "y_mid", "ratio"]
    diffs = []
    for name, r, g in zip(names, ref, got):
        d = float(jnp.abs(jnp.asarray(r) - jnp.asarray(g)).max())
        diffs.append(f"{name}={d:.2e}")
    log(f"  diffs vs jnp (bf16-conv jnp vs kernel): " + " ".join(diffs))


def main():
    log(f"=== rk-step probe: B={B} {H}x{W}x{C} tol={RTOL}, iters={ITERS}, "
        f"backend={jax.default_backend()} ===")
    cfg, params, t0, dt, y0 = build_inputs()
    func, step = jnp_step(cfg, params)

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if "--no-jnp" not in sys.argv:
        timed_step(step, func, t0, dt, y0, "jnp step (production)")

    for spec in args:
        parts = spec.split(":")
        strategy, tile, prec = parts[0], int(parts[1]), parts[2]
        fused = make_fused_dopri5_step(
            params, ADAPTIVE_TABLEAUS["dopri5"], (H, W), groups=cfg.groups,
            rtol=RTOL, atol=ATOL, conv_strategy=strategy,
            conv_precision=prec, interpret=False, tile=tile,
        )
        r = timed_step(fused, func, t0, dt, y0,
                       f"fused {strategy} tb={tile} {prec}")
        if r is not None:
            check_against_jnp(cfg, params, fused, t0, dt, y0)


if __name__ == "__main__":
    main()
