#!/usr/bin/env python
"""Evaluate a trained checkpoint's test top-1 under solver overrides — the
solver-fidelity → accuracy ladder's measurement tool (RESULTS.md; VERDICT
r2 #6 wants it per-seed).  Prints ONE JSON line:
    {"top1": .., "mean_nfe": .., "solver": .., "tol": ..}

Fixed-grid rungs (``--solver euler --steps N``) integrate over a uniform
(N+1)-point ts grid; adaptive rungs use ``--tol``.

reference: the reference's test-time solver sweep (train.py eval loop —
UNVERIFIED, SURVEY.md §4).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--run", required=True,
                   help="run dir (ckpt_best.msgpack) or .msgpack path")
    p.add_argument("--dataset", default="synthetic-cifar10")
    p.add_argument("--solver", default="dopri5")
    p.add_argument("--tol", type=float, default=1e-3)
    p.add_argument("--steps", type=int, default=None,
                   help="fixed-grid methods: number of uniform steps")
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=512)
    p.add_argument("--data-dir", default=None)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        # Gated enablement (XLA:CPU AOT entries are machine-feature-
        # specific — see utils/compile_cache.py).
        from neural_ode_features_tpu.utils import enable_tpu_compile_cache

        enable_tpu_compile_cache()
    import jax.numpy as jnp
    import numpy as np

    from neural_ode_features_tpu.data import load_dataset
    from neural_ode_features_tpu.models import odenet_trajectory
    from neural_ode_features_tpu.models.common import head_apply
    from neural_ode_features_tpu.ops.preprocess import normalize
    from neural_ode_features_tpu.utils import (
        load_checkpoint,
        resolve_checkpoint,
    )

    params, cfg0, _ = load_checkpoint(resolve_checkpoint(args.run))
    cfg = dataclasses.replace(
        cfg0, method=args.solver, tol=args.tol, adjoint=False,
        error_control="per_sample",
    )

    x, y = load_dataset(args.dataset, "test", args.data_dir,
                        limit=args.limit)
    x = normalize(x, args.dataset)
    if args.steps is not None:
        ts = jnp.linspace(0.0, 1.0, args.steps + 1)
    else:
        ts = jnp.asarray([0.0, 1.0])

    # Clamp to the split size so a --limit below --batch-size still
    # evaluates something instead of truncating n to 0 (ZeroDivisionError).
    args.batch_size = min(args.batch_size, len(x))
    n = (len(x) // args.batch_size) * args.batch_size
    x, y = x[:n], y[:n]

    @jax.jit
    def batch_top1(p, xb, yb):
        traj, stats = odenet_trajectory(p, xb, ts, cfg)
        logits = head_apply(p["head"], traj[-1], cfg)
        pred = jnp.argmax(logits, axis=-1)
        return (jnp.sum(pred == yb),
                jnp.sum(stats.nfe.astype(jnp.float32)))

    correct = nfe_sum = 0.0
    for lo in range(0, n, args.batch_size):
        c, s = batch_top1(params, jnp.asarray(x[lo:lo + args.batch_size]),
                          jnp.asarray(y[lo:lo + args.batch_size]))
        correct += float(jax.device_get(c))
        nfe_sum += float(jax.device_get(s))

    result = {
        "top1": round(correct / n, 5),
        "mean_nfe": round(nfe_sum / n, 2),
        "solver": args.solver,
        "tol": args.tol if args.steps is None else None,
        "steps": args.steps,
        "n": n,
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
