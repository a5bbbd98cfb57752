"""Training engine: jitted SGD train/eval steps, data-parallel over a mesh.

Capability parity with the reference's training pipeline (reference:
train.py ``main``/``train_epoch``/``evaluate`` :~1-250 — UNVERIFIED, empty
mount, SURVEY.md §3.1), redesigned TPU-first:

  * one compiled train step: on-device normalise→augment→solve→loss→grad→
    SGD update; raw uint8 batches stream in, nothing else crosses the host
    boundary;
  * data parallelism by sharding the batch axis of the inputs over the
    mesh's 'data' axis — XLA inserts the gradient all-reduce (no
    hand-written collectives);
  * optional FSDP-style parameter sharding (``model_shards > 1``) over a
    second 'model' mesh axis: params + optimizer state live sharded,
    GSPMD all-gathers weights at use and reduce-scatters their gradients
    (parallel/mesh.py ``param_shardings``);
  * gradients through the ODE block via the adjoint (default, O(1) memory)
    or direct backprop through a scan-unrolled solve (reference's default
    semantics; memory-hungry, mainly for tests/small runs);
  * NFE-forward AND NFE-backward are carried functionally in the step
    outputs — nfe_b rides the adjoint's ``nfe_sink`` gradient side-channel
    (solver/adjoint.py), so it is real on every backend (the axon TPU has
    no io_callback).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .models import (
    ModelConfig,
    init_odenet,
    init_resnet,
    odenet_logits,
    resnet_logits,
)
from .models.odenet import odefunc_apply
from .ops.preprocess import augment, normalize, normalized_black
from .parallel import data_sharding, make_mesh, param_shardings, replicate
from .solver import odeint

__all__ = ["TrainConfig", "Trainer"]


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """The CLI surface persisted to params.json (reference train.py flags)."""

    dataset: str = "mnist"
    model: str = "odenet"  # 'odenet' | 'resnet'
    tol: float = 1e-3
    solver: str = "dopri5"
    controller: str = "i"  # 'i' (reference parity) | 'pi' (fewer rejections)
    adjoint: bool = True
    adjoint_seminorm: bool = False
    adjoint_mode: str = "reintegrate"
    error_control: str = "per_sample"
    downsampling: str = "conv"
    # ODEfunc channel width.  64 is the reference architecture; wider
    # variants exist for the MFU-at-width story (bench.py --hidden and the
    # r5 training-width probe) and for FSDP to have real work to shard.
    hidden: int = 64
    epochs: int = 160
    batch_size: int = 128
    optimizer: str = "sgd"  # 'sgd' (reference) | 'adam'
    lr: float = 0.1
    momentum: float = 0.9
    weight_decay: float = 0.0
    lr_decay_epochs: tuple[int, ...] = (60, 100, 140)
    lr_decay_gamma: float = 0.1
    seed: int = 0
    augment: bool = True  # random crop (+flip for 3-channel data)
    num_devices: int | None = None
    # >1 adds a 'model' mesh axis: params + optimizer state shard over it
    # FSDP-style (parallel/mesh.py param_shardings); must divide num_devices.
    model_shards: int = 1
    compute_dtype: str = "float32"
    max_steps: int = 1024

    def model_config(self) -> ModelConfig:
        in_ch = 3 if "cifar" in self.dataset else 1
        return ModelConfig(
            in_channels=in_ch,
            hidden=self.hidden,
            tol=self.tol,
            method=self.solver,
            controller=self.controller,
            error_control=self.error_control,
            downsampling=self.downsampling,
            adjoint=self.adjoint,
            adjoint_seminorm=self.adjoint_seminorm,
            adjoint_mode=self.adjoint_mode,
            compute_dtype=self.compute_dtype,
            max_steps=self.max_steps,
        )


def _model_fns(train_cfg: TrainConfig):
    if train_cfg.model == "odenet":
        return init_odenet, odenet_logits
    if train_cfg.model == "resnet":
        return init_resnet, lambda p, x, cfg, adjoint=None: (
            resnet_logits(p, x, cfg),
            None,
        )
    raise ValueError(f"unknown model {train_cfg.model!r}")


def _direct_diff_logits(params, x, cfg: ModelConfig):
    """Reference-default gradient semantics: direct backprop through the
    (scan-unrolled, reverse-differentiable) adaptive solve.  The Pallas
    dynamics are differentiable (custom-VJP kernel pair), so cfg.use_pallas
    is honoured here too."""
    from .models.common import head_apply, stem_apply

    h0 = stem_apply(params["stem"], x, cfg)
    ts = jnp.asarray([0.0, 1.0], h0.dtype)
    traj, stats = odeint(
        lambda t, y: odefunc_apply(params["odefunc"], t, y, cfg),
        h0,
        ts,
        rtol=cfg.tol,
        atol=cfg.tol,
        method=cfg.method,
        error_control=cfg.error_control,
        max_steps=cfg.max_steps,
        controller=cfg.controller,
        unroll="scan_remat",
    )
    return head_apply(params["head"], traj[-1], cfg), stats


def _stage_train(staged, images_u8, labels, sharding):
    """Identity-keyed device staging shared by Trainer and
    PopulationTrainer (code-review r4: was copy-pasted in both).

    Keyed on the source arrays THEMSELVES (strong refs + identity): a
    strong ref pins the objects so their ids can never be recycled — an
    id()-keyed variant could silently reuse stale staged data for a new
    array allocated at a dead array's address (ADVICE r1).  Returns the
    (possibly refreshed) staged tuple
    ``(images_u8, labels, img_dev, lab_dev)``.
    """
    if staged is None or not (
        staged[0] is images_u8 and staged[1] is labels
    ):
        staged = (
            images_u8,
            labels,
            jax.device_put(images_u8, sharding),
            jax.device_put(labels.astype(np.int32), sharding),
        )
    return staged


def _stage_eval(staged, images_u8, labels, batch_size, sharding):
    """Identity-keyed eval staging: zero-pad the tail to a multiple of
    ``batch_size``, stage with a validity mask (see :func:`_stage_train`
    for the identity-keying rationale).  Returns ``(staged, idx_dev)``
    where ``staged = (images_u8, labels, img_dev, lab_dev, val_dev)`` and
    ``idx_dev`` is the ``(n_batches, batch_size)`` gather index plan."""
    n = len(images_u8)
    n_pad = (-n) % batch_size
    if staged is None or not (
        staged[0] is images_u8 and staged[1] is labels
    ):
        img = np.concatenate(
            [images_u8,
             np.zeros((n_pad,) + images_u8.shape[1:], images_u8.dtype)]
        ) if n_pad else images_u8
        lab = np.concatenate(
            [labels.astype(np.int32), np.zeros(n_pad, np.int32)]
        ) if n_pad else labels.astype(np.int32)
        val = np.concatenate([np.ones(n, bool), np.zeros(n_pad, bool)])
        staged = (
            images_u8,
            labels,
            jax.device_put(img, sharding),
            jax.device_put(lab, sharding),
            jax.device_put(val, sharding),
        )
    idx = jax.device_put(
        np.arange(n + n_pad, dtype=np.int32).reshape(-1, batch_size),
        sharding,
    )
    return staged, idx


class Trainer:
    """Owns params/opt-state, the compiled steps, and the mesh."""

    def __init__(self, train_cfg: TrainConfig, steps_per_epoch: int):
        if steps_per_epoch < 1:
            # drop_remainder batching: a dataset smaller than one batch
            # trains ZERO steps yet would still log rows and save
            # checkpoints every epoch — refuse instead (code-review r4).
            raise ValueError(
                f"steps_per_epoch={steps_per_epoch}: the training set is "
                f"smaller than batch_size={train_cfg.batch_size} "
                "(drop-remainder batching trains nothing); lower "
                "--batch-size or raise --limit")
        self.cfg = train_cfg
        self.model_cfg = train_cfg.model_config()
        self.mesh = make_mesh(
            train_cfg.num_devices, model_size=train_cfg.model_shards
        )
        self.steps_per_epoch = steps_per_epoch

        init_fn, self.apply_fn = _model_fns(train_cfg)
        key = jax.random.PRNGKey(train_cfg.seed)
        params = init_fn(key, self.model_cfg)

        boundaries = {
            e * steps_per_epoch: train_cfg.lr_decay_gamma
            for e in train_cfg.lr_decay_epochs
        }
        schedule = optax.piecewise_constant_schedule(train_cfg.lr, boundaries)
        self.schedule = schedule
        if train_cfg.optimizer == "sgd":
            opt = optax.sgd(schedule, momentum=train_cfg.momentum,
                            nesterov=False)
        elif train_cfg.optimizer == "adam":
            opt = optax.adam(schedule)
        else:
            raise ValueError(f"unknown optimizer {train_cfg.optimizer!r}")
        tx = optax.chain(
            optax.add_decayed_weights(train_cfg.weight_decay)
            if train_cfg.weight_decay
            else optax.identity(),
            opt,
        )
        self.tx = tx

        rep = replicate(self.mesh)
        opt_state = tx.init(params)
        # Replicated when model_shards == 1 (the default); FSDP-sharded over
        # the 'model' axis otherwise.  The shape-based rule shards params and
        # the params-shaped momentum leaves identically, so SGD updates stay
        # local; GSPMD inserts the per-use weight all-gather and the
        # gradient reduce-scatter from these annotations alone.
        self._psh = param_shardings(self.mesh, params)
        self._osh = param_shardings(self.mesh, opt_state)
        self.params = jax.device_put(params, self._psh)
        self.opt_state = jax.device_put(opt_state, self._osh)

        dsh = data_sharding(self.mesh)
        self._train_step = jax.jit(
            self._train_step_impl,
            in_shardings=(self._psh, self._osh, dsh, dsh, rep),
            # Pin params/opt-state shardings across steps — without the
            # constraint GSPMD may shard small (64,) leaves over 'data'.
            out_shardings=(self._psh, self._osh, rep),
            donate_argnums=(0, 1),
        )
        self._eval_step = jax.jit(
            self._eval_step_impl, in_shardings=(self._psh, dsh, dsh, dsh)
        )

    # -- step bodies ---------------------------------------------------------
    def _preprocess(self, images_u8, rng, train: bool):
        x = normalize(images_u8, self.cfg.dataset)
        if train and self.cfg.augment:
            flip = x.shape[-1] == 3  # no flip for MNIST digits
            x = augment(rng, x, pad=4, flip=flip,
                        fill=normalized_black(self.cfg.dataset, x.dtype))
        return x

    def _loss_and_logits(self, params, nfe_sink, x, labels):
        cfg = self.model_cfg
        if self.cfg.model == "odenet":
            if self.cfg.adjoint:
                logits, stats = odenet_logits(
                    params, x, cfg, adjoint=True, nfe_sink=nfe_sink
                )
            else:
                logits, stats = _direct_diff_logits(params, x, cfg)
            nfe = jnp.mean(stats.nfe.astype(jnp.float32))
        else:
            logits = resnet_logits(params, x, cfg)
            nfe = jnp.zeros(())
        loss = optax.softmax_cross_entropy_with_integer_labels(
            logits, labels
        ).mean()
        return loss, (logits, nfe)

    def _grads(self, params, x, labels):
        """Loss/grads plus backward-NFE: the sink's "gradient" is the adjoint
        backward solve's total dynamics evaluations (0 for resnet / direct
        backprop, which re-plays the forward tape instead of re-solving —
        matching the reference's counter semantics, SURVEY.md §3.1)."""
        (loss, (logits, nfe)), (grads, nfe_b) = jax.value_and_grad(
            self._loss_and_logits, argnums=(0, 1), has_aux=True
        )(params, jnp.zeros(()), x, labels)
        return loss, logits, nfe, grads, nfe_b

    def _train_step_impl(self, params, opt_state, images_u8, labels, rng):
        x = self._preprocess(images_u8, rng, train=True)
        loss, logits, nfe, grads, nfe_b = self._grads(params, x, labels)
        updates, opt_state = self.tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        acc = jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))
        return params, opt_state, {
            "loss": loss, "acc": acc, "nfe": nfe, "nfe_b": nfe_b
        }

    def _eval_step_impl(self, params, images_u8, labels, valid):
        x = self._preprocess(images_u8, None, train=False)
        cfg = self.model_cfg
        valid_f = valid.astype(jnp.float32)
        if self.cfg.model == "odenet":
            logits, stats = odenet_logits(params, x, cfg, adjoint=False)
            # Masked per-sample sum, exactly like _eval_fused_impl: the
            # zero-padded tail samples' solves must not count (code-review
            # r4 — the two eval paths disagreed on test_nfe on padded
            # tails; global control yields a (1,) nfe, hence the broadcast).
            nfe_ps = stats.nfe.astype(jnp.float32)
            if nfe_ps.shape[0] != valid.shape[0]:
                nfe_ps = jnp.broadcast_to(nfe_ps, valid.shape)
            nfe_sum = jnp.sum(nfe_ps * valid_f)
        else:
            logits = resnet_logits(params, x, cfg)
            nfe_sum = jnp.zeros(())
        correct = ((jnp.argmax(logits, -1) == labels) & valid).astype(jnp.float32)
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
        return {
            "correct": jnp.sum(correct),
            "loss_sum": jnp.sum(ce * valid_f),
            "count": jnp.sum(valid_f),
            "nfe_sum": nfe_sum,
        }

    # -- fused epoch: the whole epoch as ONE device dispatch ------------------
    # MNIST/CIFAR fit in HBM as uint8 (45/180 MB), so the epoch loop can be a
    # lax.scan over shuffled batch indices with zero host round trips — the
    # host only ships the dataset once and fetches per-step metrics once per
    # epoch.  (The reference pays a DataLoader + kernel-launch round trip per
    # batch; on this machine's tunneled TPU a dispatch alone costs ~0.6 s.)
    def _train_epoch_impl(self, params, opt_state, images, labels, perm, rng,
                          constrain: bool = True):
        # ``constrain=False`` drops the batch-axis sharding hints: the
        # population trainer (multi.py) vmaps this body over a seed axis and
        # parallelises over THAT axis instead (the hints would otherwise
        # apply to vmap-batched intermediates whose leading axis is seeds,
        # not batch).
        dsh = data_sharding(self.mesh) if constrain else None
        _c = (jax.lax.with_sharding_constraint if constrain
              else (lambda x, _: x))

        def step(carry, xs):
            params, opt_state, rng = carry
            idx = xs
            rng, sub = jax.random.split(rng)
            img = _c(images[idx], dsh)
            lab = _c(labels[idx], dsh)
            x = self._preprocess(img, sub, train=True)
            loss, logits, nfe, grads, nfe_b = self._grads(params, x, lab)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            acc = jnp.mean((jnp.argmax(logits, -1) == lab).astype(jnp.float32))
            return (params, opt_state, rng), {
                "loss": loss, "acc": acc, "nfe": nfe, "nfe_b": nfe_b
            }

        (params, opt_state, _), metrics = jax.lax.scan(
            step, (params, opt_state, rng), perm
        )
        return params, opt_state, metrics

    def train_epoch(self, images_u8, labels, epoch: int):
        """Run one epoch fully on device; returns stacked per-step metrics."""
        rep = replicate(self.mesh)
        if not hasattr(self, "_train_epoch"):
            self._train_epoch = jax.jit(
                self._train_epoch_impl,
                in_shardings=(self._psh, self._osh, rep, rep, rep, rep),
                out_shardings=(self._psh, self._osh, rep),
                donate_argnums=(0, 1),
            )
            self._staged = None
        self._staged = _stage_train(self._staged, images_u8, labels, rep)
        img_dev, lab_dev = self._staged[2], self._staged[3]

        n = len(images_u8)
        bs = self.cfg.batch_size
        steps = n // bs
        rng_np = np.random.default_rng((self.cfg.seed, epoch))
        perm = rng_np.permutation(n)[: steps * bs].reshape(steps, bs)
        perm = jax.device_put(perm.astype(np.int32), rep)
        rng = jax.random.fold_in(jax.random.PRNGKey(self.cfg.seed + 1), epoch)

        self.params, self.opt_state, metrics = self._train_epoch(
            self.params, self.opt_state, img_dev, lab_dev, perm, rng
        )
        return jax.device_get(metrics)

    # -- fused eval: whole test set in one dispatch ---------------------------
    def _eval_fused_impl(self, params, images, labels, valid, idx,
                         constrain: bool = True):
        # See _train_epoch_impl on ``constrain``.
        dsh = data_sharding(self.mesh) if constrain else None
        _c = (jax.lax.with_sharding_constraint if constrain
              else (lambda x, _: x))

        def step(carry, batch_idx):
            img = _c(images[batch_idx], dsh)
            lab = _c(labels[batch_idx], dsh)
            v = _c(valid[batch_idx], dsh).astype(jnp.float32)
            x = self._preprocess(img, None, train=False)
            cfg = self.model_cfg
            if self.cfg.model == "odenet":
                logits, stats = odenet_logits(params, x, cfg, adjoint=False)
                nfe = jnp.sum(stats.nfe.astype(jnp.float32) * v) if (
                    stats.nfe.shape[0] == v.shape[0]
                ) else stats.nfe.astype(jnp.float32)[0] * jnp.sum(v)
            else:
                logits = resnet_logits(params, x, cfg)
                nfe = jnp.zeros(())
            correct = jnp.sum(
                (jnp.argmax(logits, -1) == lab).astype(jnp.float32) * v
            )
            ce = optax.softmax_cross_entropy_with_integer_labels(logits, lab)
            return carry, {"correct": correct, "loss": jnp.sum(ce * v),
                           "nfe": nfe}

        _, m = jax.lax.scan(step, None, idx)
        return m

    def evaluate_fused(self, images_u8, labels) -> dict[str, float]:
        """Evaluate the whole set in ONE dispatch, exactly: the tail batch is
        zero-padded and masked, so coverage equals :meth:`evaluate`."""
        rep = replicate(self.mesh)
        if not hasattr(self, "_eval_fused"):
            self._eval_fused = jax.jit(
                self._eval_fused_impl,
                in_shardings=(self._psh, rep, rep, rep, rep),
                out_shardings=rep,
            )
            self._eval_staged = None
        n = len(images_u8)
        self._eval_staged, idx = _stage_eval(
            self._eval_staged, images_u8, labels, self.cfg.batch_size, rep
        )
        img_dev, lab_dev, val_dev = self._eval_staged[2:]
        m = jax.device_get(
            self._eval_fused(self.params, img_dev, lab_dev, val_dev, idx)
        )
        return {
            "acc": float(np.sum(m["correct"])) / n,
            "loss": float(np.sum(m["loss"])) / n,
            "nfe": float(np.sum(m["nfe"])) / n,
        }

    # -- resume ----------------------------------------------------------------
    def save_state(self, path) -> None:
        """Full training state (params + optimizer) for preemption resume
        (reference: expman run lookup/resume — SURVEY.md §5)."""
        from flax import serialization

        blob = serialization.to_bytes(
            {"params": jax.device_get(self.params),
             "opt_state": jax.device_get(self.opt_state)}
        )
        from pathlib import Path

        Path(path).write_bytes(blob)

    def load_state(self, path) -> None:
        from pathlib import Path

        from flax import serialization

        template = {"params": jax.device_get(self.params),
                    "opt_state": jax.device_get(self.opt_state)}
        blob = serialization.from_bytes(template, Path(path).read_bytes())
        self.params = jax.device_put(blob["params"], self._psh)
        self.opt_state = jax.device_put(blob["opt_state"], self._osh)

    # orbax variant: sharded, no host gather (SURVEY.md §5 names
    # orbax-checkpoint as the TPU-native preemption-resume mechanism).
    #
    # Crash-safety protocol (a preemption is the whole reason this exists,
    # so the save must never leave zero restorable states): orbax's own
    # save of a FRESH directory is atomic (internal tmp dir, renamed at
    # commit), but `force=True` deletes the PREVIOUS checkpoint before the
    # new one commits.  Instead: save to `<path>.new`, rotate the old
    # checkpoint to `<path>.old`, rename `.new` into place, drop `.old`.
    # Every crash window leaves a committed state under one of the three
    # names; `orbax_state_recover` (run by load and by the existence check)
    # promotes it back to `<path>`.
    @staticmethod
    def orbax_state_recover(path) -> bool:
        """Repair an interrupted save rotation; return whether a restorable
        checkpoint exists at ``path`` afterwards."""
        import shutil
        from pathlib import Path

        path = Path(path).resolve()
        new = path.with_name(path.name + ".new")
        old = path.with_name(path.name + ".old")
        if path.exists():  # rotation finished (or never started): clean up
            if new.exists():
                shutil.rmtree(new)
            if old.exists():
                shutil.rmtree(old)
            return True
        # Crash mid-rotation.  A `.new` that exists under its final name
        # was committed by orbax (its internal tmp name is different) AND
        # fully written (save_state_orbax waits before rotating) — prefer
        # it over `.old`.
        for cand in (new, old):
            if cand.exists():
                cand.rename(path)
                if cand is new and old.exists():
                    shutil.rmtree(old)
                return True
        return False

    def _orbax_checkpointer(self):
        import orbax.checkpoint as ocp

        if getattr(self, "_orbax_ckptr", None) is None:
            # One per Trainer: each StandardCheckpointer spins up async
            # machinery that is never explicitly closed — don't make one
            # per epoch.
            self._orbax_ckptr = ocp.StandardCheckpointer()
        return self._orbax_ckptr

    def save_state_orbax(self, path) -> None:
        """Write the training state as an orbax directory checkpoint.

        Unlike :meth:`save_state` (which gathers everything to host and
        serialises one msgpack blob), orbax writes each device shard as it
        lies — on an FSDP mesh no replica ever materialises — and records
        the sharding metadata needed to reshard on restore."""
        import shutil
        from pathlib import Path

        path = Path(path).resolve()
        self.orbax_state_recover(path)  # clear any stale .new/.old first
        new = path.with_name(path.name + ".new")
        old = path.with_name(path.name + ".old")

        ckptr = self._orbax_checkpointer()
        ckptr.save(new, {"params": self.params,
                         "opt_state": self.opt_state})
        ckptr.wait_until_finished()
        if path.exists():
            path.rename(old)
        new.rename(path)
        if old.exists():
            shutil.rmtree(old)

    def load_state_orbax(self, path) -> None:
        """Restore an orbax checkpoint directly onto this Trainer's
        shardings (replicated or FSDP), resharding if the checkpoint was
        written under a different mesh/topology."""
        from pathlib import Path

        def abstract(tree, shardings):
            return jax.tree.map(
                lambda x, s: jax.ShapeDtypeStruct(
                    jnp.shape(x), x.dtype, sharding=s
                ),
                tree,
                shardings,
            )

        path = Path(path).resolve()
        if not self.orbax_state_recover(path):
            raise FileNotFoundError(f"no orbax checkpoint at {path}")
        restored = self._orbax_checkpointer().restore(
            path,
            {"params": abstract(self.params, self._psh),
             "opt_state": abstract(self.opt_state, self._osh)},
        )
        self.params = restored["params"]
        self.opt_state = restored["opt_state"]

    # -- public API ----------------------------------------------------------
    def train_batch(self, images_u8, labels, rng):
        dsh = data_sharding(self.mesh)
        images_u8 = jax.device_put(images_u8, dsh)
        labels = jax.device_put(labels, dsh)
        self.params, self.opt_state, metrics = self._train_step(
            self.params, self.opt_state, images_u8, labels, rng
        )
        return metrics

    def eval_batch(self, images_u8, labels, valid):
        dsh = data_sharding(self.mesh)
        return self._eval_step(
            self.params,
            jax.device_put(images_u8, dsh),
            jax.device_put(labels.astype(np.int32), dsh),
            jax.device_put(valid, dsh),
        )

    def evaluate(self, batches) -> dict[str, float]:
        total = {"correct": 0.0, "loss_sum": 0.0, "count": 0.0, "nfe_sum": 0.0}
        for img, lab, valid in batches.padded_batches():
            m = jax.device_get(self.eval_batch(img, lab, valid))
            for k in total:
                total[k] += float(m[k])
        # Per-VALID-sample mean, identical to evaluate_fused (padded tail
        # samples excluded; partial batches weighted by their real size).
        return {
            "acc": total["correct"] / max(total["count"], 1),
            "loss": total["loss_sum"] / max(total["count"], 1),
            "nfe": total["nfe_sum"] / max(total["count"], 1),
        }
