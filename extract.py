#!/usr/bin/env python
"""Extract continuous features at a sweep of integration times t ∈ [0, 1].

CLI parity with the reference's extraction pipeline (reference: extract.py
:~1-120 — UNVERIFIED, empty mount, SURVEY.md §3.3): load a trained
checkpoint, run every image through the ODE block with
``t = linspace(0, 1, N)`` (ONE solve per batch — dense output yields all N
states), global-average-pool each state into a feature vector, and write
per-t feature matrices to an HDF5 file in the run directory.

ResNet checkpoints tap the discrete block boundaries instead (block k ↦
t = k/num_blocks).

``--fused`` runs the whole split (and the --nfe-sort probe pass) as ONE
jitted ``lax.scan`` dispatch instead of one dispatch per batch — identical
output, one tunnel round-trip (~0.6 s each on this machine's TPU).

Output layout (``features.h5`` unless --output):
    /t            (T,)  float32 — integration times
    /features     (T, N, C) float32 — per-t feature matrices
    /labels       (N,) int32
    /nfe          (N,) int32 — per-sample NFE of the extraction solve
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--run", required=True,
                   help="run directory (from train.py) or checkpoint path")
    p.add_argument("--ckpt", default="ckpt_best.msgpack",
                   help="checkpoint file name inside --run")
    p.add_argument("--timestamps", type=int, default=11,
                   help="number of t values in linspace(0, 1, N)")
    p.add_argument("--split", default="test", choices=["train", "test"])
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--output", default=None, help="output .h5 path")
    p.add_argument("--data-dir", default=None)
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--nfe-sort", action="store_true",
                   help="order samples by a cheap 10x-loose-tolerance NFE "
                        "pre-pass so each batch is NFE-homogeneous (the "
                        "per-sample while_loop runs until its slowest "
                        "sample finishes; mixed batches pay the max). Only "
                        "helps when per-sample NFE actually varies - on the "
                        "synthetic twins it is uniform and this is a no-op "
                        "costing one extra loose pass")
    p.add_argument("--fused", action="store_true",
                   help="extract the WHOLE split in one device dispatch "
                        "(lax.scan over the padded batches inside jit) "
                        "instead of one dispatch per batch — on the "
                        "tunneled TPU each dispatch costs ~0.6 s. The "
                        "--nfe-sort probe pass fuses the same way. "
                        "Results are identical")
    p.add_argument("--cpu", action="store_true")
    return p.parse_args(argv)


def _scan_batches(fn, params, imgs_stacked):
    """Run ``fn(params, batch)`` over a (S, B, ...) batch stack as ONE jitted
    ``lax.scan`` dispatch; returns the stacked outputs on host."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def run(p, imgs):
        return lax.scan(lambda _, im: (None, fn(p, im)), None, imgs)[1]

    return jax.device_get(run(params, jnp.asarray(imgs_stacked)))


def _valid_nfe(nfe, valid):
    """Per-valid-sample NFE: global error control yields a (1,) NFE per
    batch — broadcast it to the batch before masking off padded rows."""
    nfe = np.asarray(nfe)
    if nfe.shape[0] != valid.shape[0]:
        nfe = np.broadcast_to(nfe, valid.shape)
    return nfe[valid]


def main(argv=None):
    args = parse_args(argv)
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from neural_ode_features_tpu.utils import enable_tpu_compile_cache

    enable_tpu_compile_cache(cpu=args.cpu)  # gated (utils/compile_cache.py)
    import h5py
    import jax.numpy as jnp

    from neural_ode_features_tpu.data import Batches, load_dataset
    from neural_ode_features_tpu.models import (
        init_odenet,
        init_resnet,
        odenet_trajectory,
        pool_features,
        resnet_block_states,
    )
    from neural_ode_features_tpu.utils import (
        load_checkpoint,
        resolve_checkpoint,
    )

    ckpt_path = resolve_checkpoint(args.run, name=args.ckpt)
    run_dir = ckpt_path.parent

    # Model family from checkpoint metadata.
    import json

    meta = json.loads(ckpt_path.with_suffix(
        ckpt_path.suffix + ".json").read_text())
    model = meta.get("extra", {}).get("model", "odenet")
    init_fn = init_odenet if model == "odenet" else init_resnet
    params, cfg, extra = load_checkpoint(ckpt_path, init_fn)
    dataset = extra.get("train", {}).get("dataset") or (
        "mnist" if cfg.in_channels == 1 else "cifar10"
    )
    print(f"checkpoint: {ckpt_path} (model={model}, dataset={dataset}, "
          f"tol={cfg.tol})")

    images, labels = load_dataset(dataset, args.split, args.data_dir,
                                  limit=args.limit)

    from neural_ode_features_tpu.ops.preprocess import normalize

    order = None
    if args.nfe_sort and model == "odenet":
        # Cheap pre-pass: per-sample NFE at a loose tolerance strongly
        # predicts the NFE ordering at the target tolerance.
        import dataclasses

        from neural_ode_features_tpu.models import odenet_logits

        cfg_loose = dataclasses.replace(cfg, tol=min(cfg.tol * 10, 1e-1),
                                        adjoint=False)

        def probe_body(p, img_u8):
            x = normalize(img_u8, dataset)
            _, st = odenet_logits(p, x, cfg_loose)
            return st.nfe

        probe_b = Batches(images, labels, args.batch_size, shuffle=False,
                          drop_remainder=False)
        nfe_pred = []
        if args.fused:
            trip = list(probe_b.padded_batches())
            nfes = _scan_batches(probe_body, params,
                                 np.stack([t[0] for t in trip]))
            for (_, _, valid), nfe in zip(trip, np.asarray(nfes)):
                nfe_pred.append(_valid_nfe(nfe, valid))
        else:
            probe = jax.jit(probe_body)
            for img, _, valid in probe_b.padded_batches():
                nfe = jax.device_get(probe(params, img))
                nfe_pred.append(_valid_nfe(nfe, valid))
        nfe_pred = np.concatenate(nfe_pred)
        order = np.argsort(nfe_pred, kind="stable")
        images, labels = images[order], labels[order]
        print(f"nfe-sort: predicted NFE spread "
              f"{nfe_pred.min()}..{nfe_pred.max()}")

    batches = Batches(images, labels, args.batch_size, shuffle=False,
                      drop_remainder=False)

    if model == "odenet":
        ts = jnp.linspace(0.0, 1.0, args.timestamps)

        def extract_body(p, img_u8):
            x = normalize(img_u8, dataset)
            traj, stats = odenet_trajectory(p, x, ts, cfg)
            return pool_features(traj), stats.nfe
    else:
        ts = jnp.linspace(0.0, 1.0, cfg.num_blocks + 1)

        def extract_body(p, img_u8):
            x = normalize(img_u8, dataset)
            states = resnet_block_states(p, x, cfg)
            feats = pool_features(states)
            return feats, jnp.zeros((x.shape[0],), jnp.int32)

    feats_parts, nfe_parts, label_parts = [], [], []
    if args.fused:
        trip = list(batches.padded_batches())
        feats_all, nfes_all = _scan_batches(
            extract_body, params, np.stack([t[0] for t in trip]))
        for (_, lab, valid), f, nfe in zip(trip, np.asarray(feats_all),
                                           np.asarray(nfes_all)):
            feats_parts.append(np.asarray(f[:, valid], np.float32))
            nfe_parts.append(_valid_nfe(nfe, valid).astype(np.int32))
            label_parts.append(lab[valid])
    else:
        extract_batch = jax.jit(extract_body)
        for img, lab, valid in batches.padded_batches():
            f, nfe = jax.device_get(extract_batch(params, img))
            feats_parts.append(np.asarray(f[:, valid], np.float32))
            nfe_parts.append(_valid_nfe(nfe, valid).astype(np.int32))
            label_parts.append(lab[valid])

    features = np.concatenate(feats_parts, axis=1)  # (T, N, C)
    nfe = np.concatenate(nfe_parts)
    labels_out = np.concatenate(label_parts).astype(np.int32)
    if order is not None:  # restore the dataset's original sample order
        inv = np.empty_like(order)
        inv[order] = np.arange(len(order))
        features, nfe, labels_out = features[:, inv], nfe[inv], labels_out[inv]

    out_path = Path(args.output) if args.output else (
        run_dir / f"features_{args.split}.h5"
    )
    with h5py.File(out_path, "w") as f:
        f.create_dataset("t", data=np.asarray(ts, np.float32))
        f.create_dataset("features", data=features)
        f.create_dataset("labels", data=labels_out)
        f.create_dataset("nfe", data=nfe)
        f.attrs["dataset"] = dataset
        f.attrs["model"] = model
        f.attrs["tol"] = cfg.tol
    print(f"wrote {out_path}: features {features.shape}, "
          f"mean NFE {nfe.mean():.1f}")
    return out_path


if __name__ == "__main__":
    main()
