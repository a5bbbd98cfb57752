#!/usr/bin/env python
"""Example: the framework's signature capability in ~40 lines.

Train a tiny ODE-Net for a few steps, then extract features of the SAME
images at 9 integration times from ONE solve and watch the class structure
sharpen with t (retrieval mAP increases monotonically).

Runs anywhere:  python examples/continuous_features.py  (add --cpu off-TPU).
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from neural_ode_features_tpu.data import load_dataset
    from neural_ode_features_tpu.evaluation import retrieval_map
    from neural_ode_features_tpu.models import ODENet
    from neural_ode_features_tpu.ops.preprocess import normalize
    from neural_ode_features_tpu.training import TrainConfig, Trainer

    # 1. a few epochs on the synthetic twin (same code path as real MNIST)
    x_train, y_train = load_dataset("synthetic-mnist", "train", limit=1024)
    cfg = TrainConfig(dataset="synthetic-mnist", tol=1e-2, batch_size=64,
                      augment=False, epochs=2, lr=0.1)
    trainer = Trainer(cfg, steps_per_epoch=16)
    for epoch in range(2):
        m = trainer.train_epoch(x_train, y_train, epoch)
        print(f"epoch {epoch}: loss {float(m['loss'][-1]):.3f} "
              f"nfe {float(m['nfe'][-1]):.1f}")

    # 2. continuous features at 9 times t ∈ [0,1] — ONE solve per batch
    net = ODENet(trainer.params, trainer.model_cfg)
    x_test, y_test = load_dataset("synthetic-mnist", "test", limit=512)
    ts = jnp.linspace(0.0, 1.0, 9)
    feats, stats = net.features(normalize(jnp.asarray(x_test),
                                          "synthetic-mnist"), ts)
    print(f"\nfeatures {feats.shape} from one solve "
          f"(mean NFE {float(np.mean(np.asarray(stats.nfe))):.1f})\n")

    for i, t in enumerate(np.asarray(ts)):
        m = retrieval_map(np.asarray(feats[i], np.float64), y_test)
        print(f"t={t:.3f}  retrieval mAP={m:.4f}")


if __name__ == "__main__":
    main()
