#!/usr/bin/env python
"""Example: FSDP training on a (data, model) mesh + sharded checkpoints.

Walks the full multi-chip story on a VIRTUAL 8-device CPU mesh (no TPU pod
needed — the same code runs unchanged on real chips, where `jax.devices()`
supplies the hardware):

  1. build a 4×2 (data, model) mesh;
  2. train an ODE-Net for a few adjoint steps with every parameter and
     optimizer-state leaf sharded over the 'model' axis — GSPMD inserts the
     weight all-gathers and gradient reduce-scatters from the jit sharding
     annotations alone, no model-code changes;
  3. save the training state as an orbax directory checkpoint, each shard
     written from the device that owns it (no host gather);
  4. restore it onto a DIFFERENT topology (one replicated device) and show
     the loss continues from the same value — the reshard is automatic.

    python examples/fsdp_training.py

reference: none — SURVEY.md §2.4 (the reference is single-GPU torch; the
mesh/FSDP layer EXCEEDS parity and is this framework's scaling surface).
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# Must be set before the CPU client is created: 8 virtual devices.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")  # demo runs anywhere
    import numpy as np

    from neural_ode_features_tpu.data import load_dataset
    from neural_ode_features_tpu.training import TrainConfig, Trainer

    x, y = load_dataset("synthetic-mnist", "train", limit=64)
    y = y.astype(np.int32)

    cfg = TrainConfig(
        dataset="synthetic-mnist",
        model="odenet",
        tol=1e-2,
        adjoint=True,
        batch_size=16,
        lr=0.01,
        augment=False,
        epochs=1,
        num_devices=8,
        model_shards=2,   # mesh: {'data': 4, 'model': 2}
    )
    trainer = Trainer(cfg, steps_per_epoch=4)
    print(f"mesh: {dict(trainer.mesh.shape)}")

    sharded = sum(
        1
        for leaf in jax.tree.leaves(trainer.params)
        if hasattr(leaf, "sharding") and "model" in (leaf.sharding.spec or ())
    )
    total = len(jax.tree.leaves(trainer.params))
    print(f"parameter leaves sharded over 'model': {sharded}/{total}")

    rng = jax.random.PRNGKey(0)
    loss = None
    for step in range(4):
        rng, sub = jax.random.split(rng)
        lo = (step * cfg.batch_size) % len(x)
        m = trainer.train_batch(
            x[lo:lo + cfg.batch_size], y[lo:lo + cfg.batch_size], sub)
        loss = float(jax.device_get(m["loss"]))
        print(f"step {step}: loss {loss:.6f} "
              f"nfe_f {float(jax.device_get(m['nfe'])):.1f}")

    ckpt = Path("/tmp/fsdp_example_state.orbax")
    trainer.save_state_orbax(ckpt)
    print(f"saved sharded orbax checkpoint: {ckpt}")

    # Restore onto a different topology: one device, fully replicated.
    single = Trainer(
        TrainConfig(**{**{k: v for k, v in vars(cfg).items()
                          if not k.startswith("_")},
                       "num_devices": 1, "model_shards": 1}),
        steps_per_epoch=4,
    )
    single.load_state_orbax(ckpt)

    def eval_loss(tr):
        m = jax.device_get(tr.eval_batch(x[:16], y[:16], np.ones(16, bool)))
        return float(m["loss_sum"]) / float(m["count"])

    sharded_loss = eval_loss(trainer)
    restored_loss = eval_loss(single)
    print(f"eval loss — 4×2 FSDP mesh: {sharded_loss:.6f}, restored on 1 "
          f"replicated device: {restored_loss:.6f}")
    assert abs(sharded_loss - restored_loss) < 1e-4, "reshard changed state!"
    print("OK — same state across topologies")


if __name__ == "__main__":
    main()
