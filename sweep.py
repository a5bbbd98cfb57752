#!/usr/bin/env python
"""Tolerance sweep: batched inference with per-sample adaptive steps across
an rtol/atol grid (BASELINE.json config 5).

For each tolerance: throughput (img/s), per-sample NFE statistics, and —
when a checkpoint + dataset are given — top-1 accuracy.  Writes a CSV and
prints one row per tolerance.  This is the accuracy-vs-cost trade-off curve
the reference explores by re-running inference at different --tol values
(reference: train/extract tol flag, SURVEY.md §2.1).

Example:
    python sweep.py --tols 1e-1,1e-2,1e-3,1e-4 --batch-size 256
    python sweep.py --run runs/<dir> --dataset synthetic-mnist --limit 2048
"""

from __future__ import annotations

import argparse
import csv
import time
from pathlib import Path

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
    p.add_argument("--output", default="tolerance_sweep.csv")
    p.add_argument("--cpu", action="store_true")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import dataclasses

    import jax.numpy as jnp
    from jax import lax

    from neural_ode_features_tpu.models import (
        ModelConfig,
        init_odenet,
        odenet_logits,
    )

    if args.run:
        from neural_ode_features_tpu.utils import load_checkpoint

        run = Path(args.run)
        ckpt = run / "ckpt_best.msgpack" if run.is_dir() else run
        params, cfg0, extra = load_checkpoint(ckpt)
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
    else:
        images = labels = None

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


if __name__ == "__main__":
    main()
