#!/usr/bin/env python
"""Tolerance sweep: batched inference with per-sample adaptive steps across
an rtol/atol grid (BASELINE.json config 5).

For each tolerance: throughput (img/s), per-sample NFE statistics, and —
when a checkpoint + dataset are given — top-1 accuracy.  Writes a CSV and
prints one row per tolerance.  This is the accuracy-vs-cost trade-off curve
the reference explores by re-running inference at different --tol values
(reference: train/extract tol flag, SURVEY.md §2.1).

``--fused`` runs the WHOLE grid as one compile + one device dispatch: rtol
becomes a traced scalar vmapped over the grid (models/odenet._solve ``tol``
override), so the tunneled TPU pays one round-trip instead of
T compiles + T×batches dispatches.  Results are identical (verified:
tests/test_sweep_fused.py); per-tol wall time is unobservable inside one
dispatch, so rows carry the shared ``sweep_s`` and per-tol NFE instead of
``ips``.

Example:
    python sweep.py --tols 1e-1,1e-2,1e-3,1e-4 --batch-size 256
    python sweep.py --run runs/<dir> --dataset synthetic-mnist --limit 2048
    python sweep.py --fused --run runs/<dir> --dataset synthetic-cifar10
"""

from __future__ import annotations

import argparse
import csv
import time

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--tols", default="1e-1,1e-2,1e-3,1e-4")
    p.add_argument("--run", default=None,
                   help="run dir / checkpoint: sweep a trained model and "
                        "report accuracy (default: random init, speed only)")
    p.add_argument("--dataset", default=None)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--limit", type=int, default=1024)
    p.add_argument("--method", default=None,
                   help="override the solver (default: checkpoint's)")
    p.add_argument("--error-control", default="per_sample",
                   choices=["per_sample", "global"])
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--pallas", action="store_true")
    p.add_argument("--fused", action="store_true",
                   help="run the WHOLE tolerance grid in one compile and "
                        "one device dispatch (rtol becomes a traced scalar, "
                        "vmapped over the grid). One tunnel round-trip and "
                        "one compile instead of per-tol recompiles; rows "
                        "report sweep_s (shared wall clock) instead of "
                        "per-tol ips — NFE is the per-tol cost")
    p.add_argument("--output", default="tolerance_sweep.csv")
    p.add_argument("--cpu", action="store_true")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from neural_ode_features_tpu.utils import enable_tpu_compile_cache

    enable_tpu_compile_cache(cpu=args.cpu)  # gated (utils/compile_cache.py)
    import dataclasses

    import jax.numpy as jnp
    from jax import lax

    from neural_ode_features_tpu.models import (
        ModelConfig,
        init_odenet,
        odenet_logits,
    )

    if args.run:
        from neural_ode_features_tpu.utils import (
            load_checkpoint,
            resolve_checkpoint,
        )

        params, cfg0, extra = load_checkpoint(resolve_checkpoint(args.run))
        dataset = args.dataset or extra.get("train", {}).get("dataset")
    else:
        cfg0 = ModelConfig(in_channels=3)
        params = init_odenet(jax.random.PRNGKey(7), cfg0)
        dataset = args.dataset

    if dataset:
        from neural_ode_features_tpu.data import load_dataset
        from neural_ode_features_tpu.ops.preprocess import normalize

        images, labels = load_dataset(dataset, "test", limit=args.limit)
        args.batch_size = min(args.batch_size, len(images))
        n = (len(images) // args.batch_size) * args.batch_size
        images, labels = images[:n], labels[:n]
        if not args.run and images.shape[-1] != cfg0.in_channels:
            # Random-init sweep on a 1-channel dataset: rebuild the model
            # at the dataset's channel count.
            cfg0 = ModelConfig(in_channels=images.shape[-1])
            params = init_odenet(jax.random.PRNGKey(7), cfg0)
    else:
        images = labels = None

    if args.fused:
        return _fused_sweep(args, params, cfg0, dataset, images, labels)

    rows = []
    for tol_s in args.tols.split(","):
        tol = float(tol_s)
        cfg = dataclasses.replace(
            cfg0,
            tol=tol,
            method=args.method or cfg0.method,
            error_control=args.error_control,
            compute_dtype="bfloat16" if args.bf16 else cfg0.compute_dtype,
            use_pallas=args.pallas,
            # Inference sweep: never route through the adjoint path (it would
            # force-disable the Pallas kernel and is slower for forward-only).
            adjoint=False,
        )

        if images is not None:
            @jax.jit
            def acc_fn(p, img_u8, lab):
                x = normalize(img_u8, dataset)
                logits, stats = odenet_logits(p, x, cfg)
                correct = jnp.sum(
                    (jnp.argmax(logits, -1) == lab).astype(jnp.float32)
                )
                return correct, stats.nfe

            # Compile outside the timed region (first TPU compile is
            # minutes on this machine's tunnel).
            acc_fn(params,
                   jnp.asarray(images[: args.batch_size]),
                   jnp.asarray(labels[: args.batch_size].astype(np.int32)),
                   )[0].block_until_ready()
            correct = 0.0
            nfes = []
            t0 = time.perf_counter()
            for lo in range(0, len(images), args.batch_size):
                c, nfe = jax.device_get(acc_fn(
                    params,
                    jnp.asarray(images[lo : lo + args.batch_size]),
                    jnp.asarray(labels[lo : lo + args.batch_size].astype(np.int32)),
                ))
                correct += float(c)
                nfes.append(nfe)
            dt = time.perf_counter() - t0
            nfes = np.concatenate(nfes)
            row = {
                "tol": tol,
                "top1": round(correct / len(images), 4),
                "ips": round(len(images) / dt, 1),
                "nfe_mean": round(float(nfes.mean()), 1),
                "nfe_min": int(nfes.min()),
                "nfe_max": int(nfes.max()),
            }
        else:
            x = jnp.asarray(
                np.random.default_rng(0).normal(
                    size=(args.batch_size, 32, 32, cfg.in_channels)
                ),
                jnp.float32,
            )

            def loop(p, xx):
                def body(carry, _):
                    x_i, nfe_acc = carry
                    logits, stats = odenet_logits(p, x_i, cfg)
                    return (xx + jnp.mean(logits) * 1e-6,
                            nfe_acc + jnp.mean(stats.nfe.astype(jnp.float32))), None

                (xf, nfe), _ = lax.scan(body, (xx, jnp.zeros(())), None,
                                        length=args.iters)
                return jnp.mean(xf), nfe / args.iters

            run_fn = jax.jit(loop)
            float(jax.device_get(run_fn(params, x)[0]))  # compile
            t0 = time.perf_counter()
            out, nfe_mean = run_fn(params, x)
            float(jax.device_get(out))
            dt = time.perf_counter() - t0
            row = {
                "tol": tol,
                "ips": round(args.batch_size * args.iters / dt, 1),
                "nfe_mean": round(float(jax.device_get(nfe_mean)), 1),
            }
        rows.append(row)
        print(" | ".join(f"{k}={v}" for k, v in row.items()), flush=True)

    with open(args.output, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {args.output}")
    return rows


def _fused_sweep(args, params, cfg0, dataset, images, labels):
    """--fused: the whole rtol grid as ONE jitted dispatch.

    rtol is a traced scalar (models/odenet._solve ``tol`` override) vmapped
    over the grid, so XLA compiles a single program whose leading axis is
    the tolerance; the adaptive while_loop runs until every (tol, sample)
    lane finishes.  On the tunneled TPU this replaces T compiles + T×batches
    dispatches with 1 + 1.  Per-tol wall time is not observable inside one
    dispatch — rows carry the shared ``sweep_s`` and per-tol NFE instead of
    ``ips``.
    """
    import dataclasses

    import jax
    import jax.numpy as jnp
    from jax import lax

    from neural_ode_features_tpu.models import odenet_logits

    tols = [float(s) for s in args.tols.split(",")]
    rtols = jnp.asarray(tols, jnp.float32)
    cfg = dataclasses.replace(
        cfg0,
        method=args.method or cfg0.method,
        error_control=args.error_control,
        compute_dtype="bfloat16" if args.bf16 else cfg0.compute_dtype,
        use_pallas=args.pallas,
        adjoint=False,
    )

    if images is not None:
        from neural_ode_features_tpu.ops.preprocess import normalize

        idx = np.arange(len(images)).reshape(-1, args.batch_size)
        imgs_d = jnp.asarray(images)
        labs_d = jnp.asarray(labels.astype(np.int32))

        @jax.jit
        def sweep_fn(p, imgs, labs, idx, rtols):
            def per_tol(rtol):
                def step(correct, bi):
                    x = normalize(imgs[bi], dataset)
                    logits, stats = odenet_logits(p, x, cfg, adjoint=False,
                                                  tol=rtol)
                    c = jnp.sum(
                        (jnp.argmax(logits, -1) == labs[bi]).astype(
                            jnp.float32)
                    )
                    return correct + c, stats.nfe
                correct, nfes = lax.scan(step, jnp.zeros(()), idx)
                return correct, nfes.reshape(-1)

            return jax.vmap(per_tol)(rtols)

        idx_d = jnp.asarray(idx)
        # AOT-compile outside the timed region (minutes on the tunnel,
        # cached) WITHOUT executing — a warmup call would run the whole
        # grid twice (code-review r3s4).
        compiled = sweep_fn.lower(params, imgs_d, labs_d, idx_d,
                                  rtols).compile()
        t0 = time.perf_counter()
        correct, nfes = jax.device_get(
            compiled(params, imgs_d, labs_d, idx_d, rtols))
        dt = time.perf_counter() - t0
        rows = [
            {
                "tol": tols[i],
                "top1": round(float(correct[i]) / len(images), 4),
                "nfe_mean": round(float(nfes[i].mean()), 1),
                "nfe_min": int(nfes[i].min()),
                "nfe_max": int(nfes[i].max()),
                "sweep_s": round(dt, 3),
            }
            for i in range(len(tols))
        ]
    else:
        x = jnp.asarray(
            np.random.default_rng(0).normal(
                size=(args.batch_size, 32, 32, cfg.in_channels)
            ),
            jnp.float32,
        )

        @jax.jit
        def sweep_fn(p, xx, rtols):
            def per_tol(rtol):
                def body(carry, _):
                    x_i, nfe_acc = carry
                    logits, stats = odenet_logits(p, x_i, cfg, adjoint=False,
                                                  tol=rtol)
                    live = xx + jnp.mean(logits) * 1e-6
                    return (live,
                            nfe_acc
                            + jnp.mean(stats.nfe.astype(jnp.float32))), None

                (xf, nfe), _ = lax.scan(body, (xx, jnp.zeros(())), None,
                                        length=args.iters)
                return jnp.mean(xf), nfe / args.iters

            return jax.vmap(per_tol)(rtols)

        compiled = sweep_fn.lower(params, x, rtols).compile()
        t0 = time.perf_counter()
        out, nfe_means = jax.device_get(compiled(params, x, rtols))
        dt = time.perf_counter() - t0
        rows = [
            {
                "tol": tols[i],
                "nfe_mean": round(float(nfe_means[i]), 1),
                "sweep_s": round(dt, 3),
            }
            for i in range(len(tols))
        ]

    for row in rows:
        print(" | ".join(f"{k}={v}" for k, v in row.items()), flush=True)
    with open(args.output, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {args.output}")
    return rows


if __name__ == "__main__":
    main()
