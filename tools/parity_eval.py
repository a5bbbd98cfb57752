#!/usr/bin/env python
"""Accuracy-parity protocol: identical weights, jax vs torch oracle.

BASELINE.json's north star requires top-1 "within 0.2% of reference" at
rtol=1e-3.  The real reference is unavailable (empty mount, zero egress —
SURVEY.md §0), so parity is measured against the in-repo torch-CPU oracle
(oracle/torch_ref.py: host-loop dopri5, batch-global control — the reference
execution model): load a trained checkpoint, evaluate the SAME test split
with the SAME weights through both stacks, and report both top-1s plus the
logit agreement.

    python tools/parity_eval.py --run <run_dir> [--limit 2000] [--tol 1e-3]

Exit code 1 if |top1_jax - top1_torch| > 0.2% (the parity clause).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--run", required=True,
                   help="run directory (from train.py) or checkpoint path")
    p.add_argument("--ckpt", default="ckpt_best.msgpack")
    p.add_argument("--tol", type=float, default=1e-3)
    p.add_argument("--limit", type=int, default=2000,
                   help="test images to evaluate (the torch oracle is a "
                        "host-loop CPU solver at ~10-100 img/s)")
    p.add_argument("--batch-size", type=int, default=100)
    p.add_argument("--data-dir", default=None)
    p.add_argument("--cpu", action="store_true",
                   help="run the jax side on CPU too")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from neural_ode_features_tpu.utils import enable_tpu_compile_cache

    enable_tpu_compile_cache(cpu=args.cpu)  # gated (utils/compile_cache.py)
    import dataclasses

    import torch

    from neural_ode_features_tpu.data import load_dataset
    from neural_ode_features_tpu.models import odenet_logits
    from neural_ode_features_tpu.ops.preprocess import normalize
    from neural_ode_features_tpu.oracle.torch_ref import (
        build_torch_odenet,
        load_jax_params_into_torch,
    )
    from neural_ode_features_tpu.utils import (
        load_checkpoint,
        resolve_checkpoint,
    )

    ckpt_path = resolve_checkpoint(args.run, name=args.ckpt)
    params, cfg0, extra = load_checkpoint(ckpt_path)
    dataset = extra.get("train", {}).get("dataset") or (
        "mnist" if cfg0.in_channels == 1 else "cifar10"
    )
    cfg = dataclasses.replace(cfg0, tol=args.tol, adjoint=False,
                              error_control="per_sample")
    print(f"checkpoint: {ckpt_path} (dataset={dataset}, tol={args.tol}, "
          f"n={args.limit})", file=sys.stderr)

    images, labels = load_dataset(dataset, "test", args.data_dir,
                                  limit=args.limit)
    n = len(images)

    # --- jax side (batched, per-sample adaptive) ---------------------------
    import jax.numpy as jnp

    @jax.jit
    def jax_logits(p, img_u8):
        x = normalize(img_u8, dataset)
        logits, _ = odenet_logits(p, x, cfg)
        return logits

    preds_j, logits_j = [], []
    for lo in range(0, n, args.batch_size):
        img = images[lo:lo + args.batch_size]
        lg = np.asarray(jax.device_get(jax_logits(params, img)))
        logits_j.append(lg)
        preds_j.append(lg.argmax(-1))
    logits_j = np.concatenate(logits_j)
    preds_j = np.concatenate(preds_j)
    top1_jax = float((preds_j == labels[:n]).mean())

    # --- torch oracle side (same weights, same normalised inputs) ----------
    tm = build_torch_odenet(in_channels=cfg.in_channels)
    load_jax_params_into_torch(tm, params)
    tm.eval()

    # Identical preprocessing: the same normalize the jax side jits.
    x_norm = np.asarray(jax.device_get(
        jax.jit(lambda u8: normalize(u8, dataset))(images)
    ))
    preds_t, logits_t = [], []
    t0 = time.perf_counter()
    with torch.no_grad():
        for lo in range(0, n, args.batch_size):
            xb = torch.from_numpy(
                x_norm[lo:lo + args.batch_size].transpose(0, 3, 1, 2).copy()
            )
            lg, _nfe = tm(xb, rtol=args.tol, atol=args.tol)
            lg = lg.numpy()
            logits_t.append(lg)
            preds_t.append(lg.argmax(-1))
            done = lo + len(lg)
            rate = done / (time.perf_counter() - t0)
            print(f"  oracle {done}/{n} ({rate:.0f} img/s)",
                  file=sys.stderr, end="\r")
    print(file=sys.stderr)
    logits_t = np.concatenate(logits_t)
    preds_t = np.concatenate(preds_t)
    top1_torch = float((preds_t == labels[:n]).mean())

    diff = abs(top1_jax - top1_torch)
    logit_rel = float(
        np.max(np.abs(logits_j - logits_t))
        / max(np.max(np.abs(logits_t)), 1e-12)
    )
    result = {
        "metric": "top1_parity_jax_vs_torch_oracle",
        "dataset": dataset,
        "tol": args.tol,
        "n": int(n),
        "top1_jax": round(top1_jax, 6),
        "top1_torch": round(top1_torch, 6),
        "abs_diff": round(diff, 6),
        "within_0.2pct": bool(diff <= 0.002),
        "pred_agreement": round(float((preds_j == preds_t).mean()), 6),
        "max_rel_logit_diff": round(logit_rel, 6),
    }
    print(json.dumps(result))
    return 0 if diff <= 0.002 else 1


if __name__ == "__main__":
    sys.exit(main())
