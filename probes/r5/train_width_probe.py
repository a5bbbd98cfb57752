#!/usr/bin/env python
"""Adjoint TRAINING throughput/MFU at width on the real chip (VERDICT r4 #2).

One (hidden, batch) config per process; prints ONE JSON line with img/s,
training MFU (utils/flops.py odenet_train_flops_per_image), nfe_f/nfe_b,
and s/epoch.  The measured unit is Trainer.train_epoch — the SAME fused
whole-epoch dispatch train.py runs (BASELINE.json configs[2] names adjoint
training as a first-class config; the r4 width sweep covered inference
only).

Axon discipline (CLAUDE.md): all TPU-independent prep first, persistent
compile cache, timestamped stderr, incremental partial JSON to stderr so a
timeout-killed config is still diagnosable.  Drive with
probes/r5/train_width.sh (one `timeout` per config).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

_T0 = time.monotonic()
ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, ROOT)


def log(msg):
    print(f"[train_probe +{time.monotonic() - _T0:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--hidden", type=int, required=True)
    p.add_argument("--batch-size", type=int, required=True)
    p.add_argument("--steps", type=int, default=16,
                   help="adjoint train steps per fused epoch dispatch")
    p.add_argument("--repeats", type=int, default=3,
                   help="timed epochs after the compile epoch; "
                        "value = median")
    p.add_argument("--tol", type=float, default=1e-3)
    p.add_argument("--seminorm", action="store_true")
    p.add_argument("--adjoint-mode", default="reintegrate")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    partial = {
        "metric": (f"train_imgs_per_sec_hidden{args.hidden}"
                   f"_B{args.batch_size}"),
        "hidden": args.hidden, "batch_size": args.batch_size,
        "steps_per_epoch": args.steps, "tol": args.tol,
        "seminorm": args.seminorm, "adjoint_mode": args.adjoint_mode,
        "stage": "start", "value": None,
    }

    def stage(name, **kw):
        partial["stage"] = name
        partial.update(kw)
        log(f"stage {name}: " + json.dumps(
            {k: v for k, v in kw.items()}, default=str))

    try:
        partial["host_load_1min"] = round(os.getloadavg()[0], 2)
    except OSError:
        pass

    import jax

    from neural_ode_features_tpu.utils import (
        enable_tpu_compile_cache,
        odenet_train_flops_per_image,
        peak_flops_per_chip,
    )

    enable_tpu_compile_cache(os.path.join(ROOT, ".jax_cache"), cpu=args.cpu)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from neural_ode_features_tpu.data import load_dataset
    from neural_ode_features_tpu.training import TrainConfig, Trainer

    cfg = TrainConfig(
        dataset="synthetic-cifar10",
        model="odenet",
        hidden=args.hidden,
        tol=args.tol,
        adjoint=True,
        adjoint_seminorm=args.seminorm,
        adjoint_mode=args.adjoint_mode,
        error_control="per_sample",
        batch_size=args.batch_size,
        augment=True,
        lr=0.05,
        num_devices=1,
    )
    n = args.steps * args.batch_size
    x, y = load_dataset("synthetic-cifar10", "train", limit=n)
    y = y.astype(np.int32)
    stage("data-ready", n_images=n)

    trainer = Trainer(cfg, steps_per_epoch=args.steps)
    stage("trainer-ready", backend=jax.default_backend())

    # Epoch 0 = stage + compile + run (reported separately).
    t0 = time.perf_counter()
    m = trainer.train_epoch(x, y, 0)
    dt_compile = time.perf_counter() - t0
    nfe_f = float(np.mean(m["nfe"]))
    nfe_b = float(np.mean(m["nfe_b"]))
    loss0 = float(np.mean(m["loss"]))
    if not np.isfinite(loss0):
        raise RuntimeError(f"non-finite loss in compile epoch: {loss0}")
    stage("compiled", compile_epoch_s=round(dt_compile, 2),
          nfe_f=round(nfe_f, 1), nfe_b=round(nfe_b, 1))

    dts = []
    for ep in range(1, args.repeats + 1):
        t0 = time.perf_counter()
        m = trainer.train_epoch(x, y, ep)
        dts.append(time.perf_counter() - t0)
        nfe_f = float(np.mean(m["nfe"]))
        nfe_b = float(np.mean(m["nfe_b"]))
        stage("timed", value=round(n / min(dts), 2),
              last_epoch_s=round(dts[-1], 3))

    dt_arr = np.asarray(dts)
    dt_med = float(np.median(dt_arr))
    ips = n / dt_med

    mcfg = cfg.model_config()
    flops = odenet_train_flops_per_image(mcfg, 32, nfe_f, nfe_b)
    peak = peak_flops_per_chip(jax.devices()[0].device_kind)
    achieved = flops["total"] * ips
    result = {
        "metric": partial["metric"],
        "value": round(ips, 2),
        "unit": "img/s/chip (adjoint training)",
        "hidden": args.hidden,
        "batch_size": args.batch_size,
        "steps_per_epoch": args.steps,
        "epoch_s_median": round(dt_med, 3),
        "epoch_s_band": [round(float(dt_arr.min()), 3),
                         round(float(dt_arr.max()), 3)],
        "repeats": args.repeats,
        "compile_epoch_s": round(dt_compile, 2),
        "nfe_f": round(nfe_f, 1),
        "nfe_b": round(nfe_b, 1),
        "final_loss": round(float(np.mean(m["loss"])), 4),
        "tol": args.tol,
        "seminorm": args.seminorm,
        "adjoint_mode": args.adjoint_mode,
        "backend": jax.default_backend(),
        "train_tflops": round(achieved / 1e12, 3),
        "train_mfu": round(achieved / peak, 4) if peak else None,
        "flops_per_image": round(flops["total"] / 1e6, 2),
    }
    try:
        result["host_load_1min"] = [partial.get("host_load_1min"),
                                    round(os.getloadavg()[0], 2)]
    except OSError:
        pass
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
