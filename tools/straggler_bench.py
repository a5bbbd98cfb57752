#!/usr/bin/env python
"""Straggler / NFE-bucketed-batching microbench on a mixed-stiffness pool.

Per-sample adaptive stepping (the headline feature) runs each batch's
``lax.while_loop`` until its SLOWEST sample finishes: a batch mixing easy
and stiff samples pays ~max-NFE on every lane.  NFE-bucketed batching
(extract.py --nfe-sort, bench.py --nfe-sort) reorders the pool by a cheap
loose-tolerance NFE probe so batches are NFE-homogeneous.

The flagship ODE-Net cannot demonstrate this: its GroupNorm-normalised
dynamics make per-sample NFE empirically input-independent (measured spread
[26, 26] across real data, unit noise, and 32x amplitude jitter —
RESULTS.md).  This bench isolates the mechanism on a workload where NFE
genuinely varies: a pool of scalar linear ODEs y' = -lambda*y with lambda
log-spaced over [1, lambda_max], solved in batches under per-sample control.

Prints one JSON line with three wall-clocks — per-sample shuffled,
per-sample NFE-sorted, and BATCH-GLOBAL shuffled (the reference's execution
model: one step sequence per batch driven by the batch-RMS error norm,
SURVEY.md §2.4) — plus the executed-lane-work accounting (sum over batches
of batch_size * max NFE — what the hardware actually runs — vs the sum of
per-sample NFE, the useful work) and, because the pool has a closed form
(y(1) = y0·exp(-λ)), each mode's worst per-sample error in tolerance units
|y_num − y_exact| / (atol + rtol·|y_exact|).  The error column keeps the
comparison honest — the two modes do NOT buy the same accuracy.  Measured
both ways (r4): in strict f32 (CPU) per-sample is ~8× MORE accurate than
batch-global at the default config (3.4 vs 27.5 tolerance units) while
executing ~2.9× less lane work — the dilution story is real: the
batch-RMS norm lets stiff rows drift.  The TPU per-sample column initially
read ~400 units — root-caused to the dense-output fit einsum lowering to a
bf16 dot_general (TPU default) and FIXED by a precision pin in
runge_kutta._dense_write (probes/r4/persample_tpu_accuracy.log); post-fix
the TPU column is bit-equal to the strict-f32 CPU oracle (3.44 vs global's
27.45 on both backends), so the dilution result is backend-uniform.
Wall-clock at equal requested tolerance:
per-sample + NFE-bucketing beats batch-global 4.9× raw / 2.6×
probe-inclusive at dim 16384 on chip (RESULTS.md r4).

reference: none — torchdiffeq steps batch-globally (SURVEY.md §2.4), so the
reference has neither the problem nor the mitigation; this is new-capability
harnessing.
"""

from __future__ import annotations

import argparse
import json
import time


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--pool", type=int, default=4096)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--dim", type=int, default=64,
                   help="state dimension per sample")
    p.add_argument("--lambda-max", type=float, default=200.0)
    p.add_argument("--tol", type=float, default=1e-6)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--controller", choices=("i", "pi"), default="i",
                   help="step-size controller for every solve (the pool is "
                        "stiffness-limited, the PI controller's claimed "
                        "home turf — measure it here instead of trusting "
                        "the tuning suite)")
    p.add_argument("--cpu", action="store_true")
    return p.parse_args(argv)


def run_bench(pool=4096, batch_size=256, dim=64, lambda_max=200.0,
              tol=1e-6, reps=3, controller="i"):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from neural_ode_features_tpu.solver import odeint

    n_batches = pool // batch_size
    pool = n_batches * batch_size
    rng = np.random.default_rng(0)
    lam = np.exp(rng.uniform(0.0, np.log(lambda_max), size=pool)).astype(
        np.float32
    )
    y0_np = rng.normal(size=(pool, dim)).astype(np.float32)
    ts = jnp.asarray([0.0, 1.0])

    def make_solve(error_control):
        def solve_pool(lam_dev, y0_dev, idx):
            """All batches in one dispatch; per-sample stiffness via closure
            on the gathered lambda rows."""

            def body(acc, sel):
                lam_b = lam_dev[sel][:, None]
                y0_b = y0_dev[sel]

                def f(t, y):
                    return -lam_b * y

                ys, stats = odeint(f, y0_b, ts, rtol=tol, atol=tol,
                                   error_control=error_control,
                                   controller=controller, max_steps=4096)
                # Closed form y(1) = y0 * exp(-lambda): worst per-sample
                # error in TOLERANCE UNITS (|err| / (atol + rtol*|exact|)).
                exact = y0_b * jnp.exp(-lam_b)
                err_units = jnp.max(
                    jnp.abs(ys[-1] - exact) / (tol + tol * jnp.abs(exact)),
                    axis=1,
                )
                nfe = jnp.broadcast_to(stats.nfe, (y0_b.shape[0],))
                return acc + jnp.sum(ys[-1]) * 1e-12, (
                    nfe, jnp.max(nfe), err_units
                )

            acc, (nfe, max_nfe, err) = jax.lax.scan(body, jnp.zeros(()), idx)
            return acc, nfe.reshape(-1), max_nfe, jnp.max(err)

        return jax.jit(solve_pool)

    solve = make_solve("per_sample")
    solve_global = make_solve("global")
    lam_dev = jnp.asarray(lam)
    y0_dev = jnp.asarray(y0_np)

    def measure(order, solve_fn=None):
        solve_fn = solve if solve_fn is None else solve_fn
        idx = jnp.asarray(
            order.reshape(n_batches, batch_size).astype(np.int32)
        )
        jax.block_until_ready(solve_fn(lam_dev, y0_dev, idx))  # compile/warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            acc, nfe, max_nfe, err = solve_fn(lam_dev, y0_dev, idx)
            jax.block_until_ready(acc)
            best = min(best, time.perf_counter() - t0)
        nfe = np.asarray(jax.device_get(nfe))
        max_nfe = np.asarray(jax.device_get(max_nfe))
        executed = int(np.sum(max_nfe.astype(np.int64)) * batch_size)
        return best, nfe, executed, float(jax.device_get(err))

    shuffled = rng.permutation(pool)
    t_shuf, nfe_s, lane_shuf, err_shuf = measure(shuffled)
    # The reference's execution model: batch-global error control on the
    # same shuffled pool (one dt sequence per batch, batch-RMS norm).
    t_glob, nfe_g, lane_glob, err_glob = measure(shuffled, solve_global)

    # The real mechanism: probe NFE at 10x-loose tolerance, argsort, rebatch
    # (identical to extract.py --nfe-sort / bench.py --nfe-sort).
    def probe_pool(lam_dev, y0_dev, idx):
        def body(_, sel):
            lam_b = lam_dev[sel][:, None]

            def f(t, y):
                return -lam_b * y

            _, stats = odeint(f, y0_dev[sel], ts, rtol=tol * 10,
                              atol=tol * 10, error_control="per_sample",
                              controller=controller, max_steps=4096)
            return None, stats.nfe

        _, nfes = jax.lax.scan(body, None, idx)
        return nfes.reshape(-1)

    probe = jax.jit(probe_pool)
    idx0 = jnp.asarray(
        np.arange(pool).reshape(n_batches, batch_size).astype(np.int32)
    )
    nfe_probe = jax.device_get(probe(lam_dev, y0_dev, idx0))  # compile
    t0 = time.perf_counter()
    nfe_probe = np.asarray(jax.device_get(probe(lam_dev, y0_dev, idx0)))
    probe_dt = time.perf_counter() - t0
    order = np.argsort(nfe_probe, kind="stable")
    t_sort, nfe_o, lane_sort, err_sort = measure(order)

    useful = int(np.sum(np.asarray(nfe_s, np.int64)))
    return {
        "metric": "straggler_bench_mixed_stiffness",
        "pool": pool,
        "batch_size": batch_size,
        "dim": dim,
        "tol": tol,
        "controller": controller,
        "nfe_spread": [int(nfe_s.min()), int(nfe_s.max())],
        "time_shuffled_s": round(t_shuf, 4),
        "time_nfe_sorted_s": round(t_sort, 4),
        "time_global_shuffled_s": round(t_glob, 4),
        "probe_s": round(probe_dt, 4),
        "speedup": round(t_shuf / t_sort, 3),
        "speedup_with_probe": round(t_shuf / (t_sort + probe_dt), 3),
        "speedup_vs_global": round(t_glob / (t_sort + probe_dt), 3),
        # Worst per-sample error in tolerance units (closed form): the
        # accuracy contract each wall-clock buys. Global is ~8x LESS
        # accurate (dilution) at ~2.9x the lane work — on both backends
        # since the r4 dense-write precision pin (module docstring).
        "err_units_shuffled": round(err_shuf, 2),
        "err_units_sorted": round(err_sort, 2),
        "err_units_global": round(err_glob, 2),
        "lane_work_shuffled": lane_shuf,
        "lane_work_sorted": lane_sort,
        "lane_work_global": lane_glob,
        "lane_work_useful": useful,
        "lane_work_reduction": round(lane_shuf / max(lane_sort, 1), 3),
    }


def main(argv=None):
    args = parse_args(argv)
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from neural_ode_features_tpu.utils import enable_tpu_compile_cache

    enable_tpu_compile_cache(cpu=args.cpu)  # gated (utils/compile_cache.py)
    result = run_bench(pool=args.pool, batch_size=args.batch_size,
                       dim=args.dim, lambda_max=args.lambda_max,
                       tol=args.tol, reps=args.reps,
                       controller=args.controller)
    result["backend"] = jax.default_backend()
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    main()
