"""Population training: every seed of a multi-seed campaign in ONE dispatch.

The reference trains one seed per process (reference: train.py main loop
:~1-250 — UNVERIFIED, empty mount, SURVEY.md §3.1); error bars there mean
rerunning the whole script K times.  On TPU that serialisation is pure
waste — the K runs share every shape, so the right design is a *population*
axis:

  * params / optimizer state / RNG streams / shuffle permutations all gain
    a leading ``K`` (seed) axis;
  * the whole fused-epoch train step (`training.Trainer._train_epoch_impl`)
    is ``jax.vmap``-ed over that axis — one compile, one dispatch per epoch
    for ALL seeds;
  * the population axis shards over the mesh's ``data`` axis when K divides
    the device count (`parallel.population_sharding`) — members never
    exchange gradients, so multi-chip population training is
    embarrassingly parallel (zero collectives; each chip trains K/D full
    models).  On one chip it still wins: K models' convs batch into one
    kernel stream and the per-dispatch tunnel cost is paid once.

Member ``i`` reproduces the *solo* run with ``seed = seeds[i]`` exactly at
the protocol level: identical init key (``PRNGKey(seed)``), identical
shuffle stream (``np.random.default_rng((seed, epoch))``), identical
augmentation key (``fold_in(PRNGKey(seed + 1), epoch)``).  Values match a
solo run up to XLA reduction-order noise (the vmapped kernels may fuse
differently); the per-seed checkpoints are bit-compatible with
`Trainer.save_state` so solo tooling (resume, eval_ckpt, extract) works on
population-trained runs unchanged.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

import warnings

from .parallel import population_sharding, population_shardings, replicate
from .training import (
    TrainConfig,
    Trainer,
    _model_fns,
    _stage_eval,
    _stage_train,
)

__all__ = ["PopulationTrainer"]


def _stack(trees):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)


def _index(tree, i):
    return jax.tree.map(lambda x: x[i], tree)


class PopulationTrainer:
    """K independent seeds trained simultaneously under one ``vmap``.

    Exposes the same epoch-level surface as :class:`training.Trainer`
    (``train_epoch`` / ``evaluate_fused`` / per-seed state save/load), with
    every result carrying a leading seed axis or returned as a per-seed
    list.
    """

    def __init__(self, cfg: TrainConfig, seeds, steps_per_epoch: int):
        if cfg.model_shards > 1:
            raise ValueError(
                "population training composes with data parallelism only; "
                "FSDP (model_shards > 1) shards params over 'model' while "
                "the population shards them over 'data' — pick one"
            )
        self.seeds = [int(s) for s in seeds]
        if not self.seeds:
            raise ValueError("need at least one seed")
        # The inner Trainer supplies the mesh, optimizer, model config and
        # the (pure) fused-epoch/eval step bodies; its own solo state and
        # jitted steps are unused beyond serving as the save/load template.
        self.trainer = Trainer(cfg, steps_per_epoch)
        self.cfg = cfg
        self.model_cfg = self.trainer.model_cfg
        self.mesh = self.trainer.mesh

        init_fn, _ = _model_fns(cfg)
        solo = [
            init_fn(jax.random.PRNGKey(s), self.model_cfg)
            for s in self.seeds
        ]
        params = _stack(solo)
        opt_state = jax.vmap(self.trainer.tx.init)(params)

        k = len(self.seeds)
        psh = population_sharding(self.mesh, k)
        self._pop_leaf_sh = psh
        n_dev = self.mesh.devices.size
        if n_dev > 1 and k % n_dev != 0:
            warnings.warn(
                f"population of {k} seeds does not divide the {n_dev}-device "
                f"mesh: the seed axis replicates, so EVERY device computes "
                f"the full population (no parallel speedup on this "
                f"topology). Pick a seed count that is a multiple of the "
                f"device count to shard members across chips.",
                stacklevel=2,
            )
        self._psh = population_shardings(self.mesh, params, k)
        self._osh = population_shardings(self.mesh, opt_state, k)
        self.params = jax.device_put(params, self._psh)
        self.opt_state = jax.device_put(opt_state, self._osh)

        rep = replicate(self.mesh)
        self._rep = rep
        self._pop_epoch = jax.jit(
            self._pop_epoch_impl,
            in_shardings=(self._psh, self._osh, rep, rep, psh, psh),
            out_shardings=(self._psh, self._osh, rep),
            donate_argnums=(0, 1),
        )
        self._pop_eval = jax.jit(
            self._pop_eval_impl,
            in_shardings=(self._psh, rep, rep, rep, rep),
            out_shardings=rep,
        )
        self._staged = None
        self._eval_staged = None

    # -- step bodies (vmapped Trainer bodies) --------------------------------
    def _pop_epoch_impl(self, params, opt_state, images, labels, perms, rngs):
        def one(p, o, perm, rng):
            return self.trainer._train_epoch_impl(
                p, o, images, labels, perm, rng, constrain=False
            )

        return jax.vmap(one)(params, opt_state, perms, rngs)

    def _pop_eval_impl(self, params, images, labels, valid, idx):
        def one(p):
            return self.trainer._eval_fused_impl(
                p, images, labels, valid, idx, constrain=False
            )

        return jax.vmap(one)(params)

    # -- epoch-level API -------------------------------------------------------
    def train_epoch(self, images_u8, labels, epoch: int):
        """One dispatch trains one epoch for EVERY seed; returns stacked
        per-step metrics, shape ``(K, steps)`` per key."""
        self._staged = _stage_train(self._staged, images_u8, labels,
                                    self._rep)
        img_dev, lab_dev = self._staged[2], self._staged[3]

        n = len(images_u8)
        bs = self.cfg.batch_size
        steps = n // bs
        # Per-seed shuffle + augmentation streams, identical to the solo
        # Trainer's (training.py train_epoch).
        perms = np.stack([
            np.random.default_rng((s, epoch))
            .permutation(n)[: steps * bs]
            .reshape(steps, bs)
            for s in self.seeds
        ]).astype(np.int32)
        rngs = jnp.stack([
            jax.random.fold_in(jax.random.PRNGKey(s + 1), epoch)
            for s in self.seeds
        ])
        psh = self._pop_leaf_sh
        self.params, self.opt_state, metrics = self._pop_epoch(
            self.params,
            self.opt_state,
            img_dev,
            lab_dev,
            jax.device_put(perms, psh),
            jax.device_put(rngs, psh),
        )
        return jax.device_get(metrics)

    def evaluate_fused(self, images_u8, labels) -> list[dict[str, float]]:
        """Whole test set, every seed, one dispatch; per-seed dicts with the
        same keys/semantics as ``Trainer.evaluate_fused``."""
        n = len(images_u8)
        self._eval_staged, idx = _stage_eval(
            self._eval_staged, images_u8, labels, self.cfg.batch_size,
            self._rep
        )
        img_dev, lab_dev, val_dev = self._eval_staged[2:]
        m = jax.device_get(
            self._pop_eval(self.params, img_dev, lab_dev, val_dev, idx)
        )
        return [
            {
                "acc": float(np.sum(m["correct"][i])) / n,
                "loss": float(np.sum(m["loss"][i])) / n,
                "nfe": float(np.sum(m["nfe"][i])) / n,
            }
            for i in range(len(self.seeds))
        ]

    # -- per-seed state (solo-Trainer compatible) ------------------------------
    def host_states(self):
        """ONE device→host fetch of the whole population's (params,
        opt_state); pass the result to :meth:`params_for` /
        :meth:`save_state_for` when saving several members (per-member
        fetches would transfer the full stacked trees K times over a
        tunnel whose fetch latency is the dominant cost here)."""
        return (jax.device_get(self.params), jax.device_get(self.opt_state))

    def params_for(self, i: int, host=None):
        """Seed ``i``'s parameters as a host pytree (solo-shaped)."""
        params = host[0] if host is not None else jax.device_get(self.params)
        return _index(params, i)

    def save_state_for(self, i: int, path, host=None) -> None:
        """Write seed ``i``'s full training state in the exact format of
        ``Trainer.save_state`` — a solo run can resume it."""
        from pathlib import Path

        from flax import serialization

        if host is None:
            host = self.host_states()
        blob = serialization.to_bytes({
            "params": _index(host[0], i),
            "opt_state": _index(host[1], i),
        })
        Path(path).write_bytes(blob)

    def load_states(self, paths) -> None:
        """Restore every seed from solo-format msgpack states (one path per
        seed, `Trainer.save_state` layout) and restack."""
        from pathlib import Path

        from flax import serialization

        if len(paths) != len(self.seeds):
            raise ValueError(
                f"{len(paths)} states for {len(self.seeds)} seeds"
            )
        template = {
            "params": jax.device_get(self.trainer.params),
            "opt_state": jax.device_get(self.trainer.opt_state),
        }
        blobs = [
            serialization.from_bytes(template, Path(p).read_bytes())
            for p in paths
        ]
        self.params = jax.device_put(
            _stack([b["params"] for b in blobs]), self._psh
        )
        self.opt_state = jax.device_put(
            _stack([b["opt_state"] for b in blobs]), self._osh
        )
