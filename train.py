#!/usr/bin/env python
"""Train an ODE-Net or ResNet on MNIST / CIFAR-10 (or their synthetic twins).

CLI parity with the reference's training driver (reference: train.py
argparse surface — UNVERIFIED, empty mount, SURVEY.md §2.1/§3.1): dataset
and model selection, tolerance, adjoint flag, SGD schedule, seed; a run
directory with persisted params.json, per-epoch log.csv and best/last
checkpoints.

Example:
    python train.py --dataset synthetic-mnist --model odenet --tol 1e-3 \
        --epochs 3 --batch-size 128 --lr 0.1 --runs-dir runs
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", default="mnist",
                   choices=["mnist", "cifar10", "synthetic-mnist",
                            "synthetic-cifar10"])
    p.add_argument("--model", default="odenet", choices=["odenet", "resnet"])
    p.add_argument("--tol", type=float, default=1e-3,
                   help="rtol=atol for the adaptive solver")
    p.add_argument("--solver", default="dopri5")
    p.add_argument("--controller", default="i", choices=["i", "pi"],
                   help="adaptive step-size controller: 'i' (integral, "
                        "reference NFE parity) or 'pi' (proportional-"
                        "integral — far fewer rejected steps, fewer NFE on "
                        "stiff dynamics; applies to forward AND adjoint "
                        "solves)")
    p.add_argument("--adjoint", action="store_true", default=True,
                   help="adjoint gradients (default; O(1) memory)")
    p.add_argument("--no-adjoint", dest="adjoint", action="store_false",
                   help="direct backprop through a scan-unrolled solve")
    p.add_argument("--adjoint-seminorm", action="store_true",
                   help="seminorm backward error control (Kidger et al. "
                        "2020): fewer backward NFE, same gradient quality")
    p.add_argument("--adjoint-mode", default="reintegrate",
                   choices=["reintegrate", "interpolated"],
                   help="'interpolated': backward reads y(t) from the "
                        "forward's dense solution (Daulbaev et al. 2020)")
    p.add_argument("--hidden", type=int, default=64,
                   help="ODEfunc channel width (reference architecture: 64;"
                        " must be a multiple of the GroupNorm group count"
                        " 32). Wider widths give the MXU real work — see"
                        " RESULTS.md's MFU-vs-width story")
    p.add_argument("--downsampling", default="conv", choices=["conv", "res"],
                   help="stem variant (Chen et al. --downsampling-method)")
    p.add_argument("--error-control", default="per_sample",
                   choices=["per_sample", "global"])
    p.add_argument("--epochs", type=int, default=160)
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--optimizer", default="sgd", choices=["sgd", "adam"])
    p.add_argument("--lr", type=float, default=0.1)
    p.add_argument("--momentum", type=float, default=0.9)
    p.add_argument("--weight-decay", type=float, default=0.0)
    p.add_argument("--lr-decay-epochs", default="60,100,140")
    p.add_argument("--lr-decay-gamma", type=float, default=0.1)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--seeds", default=None, metavar="S0,S1,...",
                   help="population training: vmap the fused train step "
                        "over ALL these seeds — one dispatch per epoch "
                        "trains every seed; one run dir per seed, each "
                        "solo-compatible (resume/eval/extract). The seed "
                        "axis shards over the mesh's data axis when it "
                        "divides the device count (zero collectives).")
    p.add_argument("--no-augment", dest="augment", action="store_false",
                   default=True)
    p.add_argument("--max-steps", type=int, default=None,
                   help="solver iteration bound (default: 1024 for the "
                        "adjoint path, 64 for --no-adjoint — the scan-"
                        "unrolled direct solve runs EXACTLY this many "
                        "iterations with no early exit)")
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 dynamics compute (solver control stays f32)")
    p.add_argument("--num-devices", type=int, default=None,
                   help="data-parallel devices (default: all)")
    p.add_argument("--model-shards", type=int, default=1,
                   help="FSDP parameter-sharding factor: adds a 'model' "
                        "mesh axis of this size (must divide the device "
                        "count); params + optimizer state shard over it")
    p.add_argument("--data-dir", default=None)
    p.add_argument("--runs-dir", default="runs")
    p.add_argument("--limit", type=int, default=None,
                   help="truncate the dataset (smoke tests)")
    p.add_argument("--eval-every", type=int, default=1)
    p.add_argument("--no-fused-epoch", dest="fused_epoch",
                   action="store_false", default=True,
                   help="per-batch host loop instead of the default "
                        "whole-epoch-on-device lax.scan")
    p.add_argument("--no-resume", dest="resume", action="store_false",
                   default=True,
                   help="ignore an existing train_state.msgpack in the run "
                        "dir (default: resume it, expman-style)")
    p.add_argument("--state-format", choices=("msgpack", "orbax"),
                   default="msgpack",
                   help="training-state checkpoint backend: 'msgpack' "
                        "(host-gathered single blob, the default) or "
                        "'orbax' (sharded directory checkpoint — no host "
                        "gather, reshards on restore)")
    p.add_argument("--tensorboard", action="store_true",
                   help="also write TensorBoard scalars (clu.metric_writers)"
                        " to <run_dir>/tb")
    p.add_argument("--profile", type=int, default=0, metavar="N",
                   help="capture a jax.profiler trace of N train steps "
                        "(written to <run_dir>/profile)")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (axon ignores JAX_PLATFORMS)")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.hidden <= 0 or args.hidden % 32 != 0:
        raise SystemExit(
            f"--hidden {args.hidden}: must be a positive multiple of 32 "
            "(GroupNorm groups=32 in the reference architecture)"
        )

    from neural_ode_features_tpu.utils import enable_tpu_compile_cache

    enable_tpu_compile_cache(cpu=args.cpu)  # gated (utils/compile_cache.py)

    from neural_ode_features_tpu.data import Batches, load_dataset
    from neural_ode_features_tpu.training import TrainConfig, Trainer
    from neural_ode_features_tpu.utils import (
        Experiment,
        RunningAverageMeter,
        save_checkpoint,
    )

    cfg = TrainConfig(
        dataset=args.dataset,
        model=args.model,
        tol=args.tol,
        solver=args.solver,
        controller=args.controller,
        adjoint=args.adjoint,
        adjoint_seminorm=args.adjoint_seminorm,
        adjoint_mode=args.adjoint_mode,
        error_control=args.error_control,
        downsampling=args.downsampling,
        hidden=args.hidden,
        epochs=args.epochs,
        batch_size=args.batch_size,
        optimizer=args.optimizer,
        lr=args.lr,
        momentum=args.momentum,
        weight_decay=args.weight_decay,
        lr_decay_epochs=tuple(
            int(e) for e in args.lr_decay_epochs.split(",") if e
        ),
        lr_decay_gamma=args.lr_decay_gamma,
        seed=args.seed,
        augment=args.augment,
        num_devices=args.num_devices,
        model_shards=args.model_shards,
        compute_dtype="bfloat16" if args.bf16 else "float32",
        max_steps=args.max_steps or (1024 if args.adjoint else 64),
    )

    # Execution knobs are excluded from the run identity (expman contract:
    # identical *hyperparameters* resume the same directory).
    # "seeds" is excluded so solo run identities predate the flag; the
    # population path overrides "seed" per member instead.
    # num_devices / model_shards are execution topology, not hyperparameters:
    # the same run must be resumable after a preemption onto a different
    # mesh (orbax reshards on restore) — so they must appear in neither the
    # run-dir name nor params.json (create() refuses a params mismatch on
    # resume).  NOTE: this changes run-dir names vs rounds ≤4-early, which
    # included them in the identity (code-review r4).
    exp_params = {k: v for k, v in vars(args).items()
                  if k not in ("runs_dir", "data_dir", "cpu", "eval_every",
                               "profile", "resume", "tensorboard",
                               "max_steps", "state_format", "seeds",
                               "num_devices", "model_shards")}
    if exp_params.get("controller") == "i":
        # The default controller is dropped from the identity so run names
        # predate the flag (old runs stay resumable); 'pi' changes the
        # trajectory and is a real hyperparameter, so it stays.
        del exp_params["controller"]
    if args.seeds is not None:
        return main_population(args, cfg, exp_params)
    exp = Experiment(args.runs_dir, exp_params).create()
    print(f"run dir: {exp.path}")

    x_train, y_train = load_dataset(args.dataset, "train", args.data_dir,
                                    limit=args.limit)
    x_test, y_test = load_dataset(args.dataset, "test", args.data_dir,
                                  limit=args.limit)
    train_b = Batches(x_train, y_train, args.batch_size, seed=args.seed)
    test_b = Batches(x_test, y_test, args.batch_size, shuffle=False,
                     drop_remainder=False)
    print(f"train {len(x_train)} / test {len(x_test)} images; "
          f"{len(train_b)} steps/epoch; devices: {jax.device_count()}")

    trainer = Trainer(cfg, steps_per_epoch=len(train_b))
    from neural_ode_features_tpu.utils.meters import count_parameters
    print(f"model parameters: {count_parameters(trainer.params):,}")

    start_epoch = 0
    resumed_best = 0.0
    orbax_state = args.state_format == "orbax"
    state_path = exp.file(
        "train_state.orbax" if orbax_state else "train_state.msgpack"
    )
    other_state = exp.file(
        "train_state.msgpack" if orbax_state else "train_state.orbax"
    )
    if args.resume:
        # Promote a checkpoint left under .new/.old by a save interrupted
        # mid-rotation (preemption) back to its canonical name, so the
        # exists() checks below see it.
        Trainer.orbax_state_recover(state_path if orbax_state
                                    else other_state)
    if args.resume and not state_path.exists() and other_state.exists():
        # Refuse a cross-format resume rather than silently retraining from
        # epoch 0 into a run dir that already has epochs logged.
        raise SystemExit(
            f"run dir has {other_state.name} but --state-format="
            f"{args.state_format} expects {state_path.name}; rerun with the "
            "matching --state-format (or --no-resume to start over)"
        )
    if args.resume and state_path.exists():
        if orbax_state:
            trainer.load_state_orbax(state_path)
        else:
            trainer.load_state(state_path)
        log_rows = exp.read_log()
        start_epoch = (int(log_rows[-1]["epoch"]) + 1) if log_rows else 0
        resumed_best = max(
            (float(r["test_acc"]) for r in log_rows if r.get("test_acc")),
            default=0.0,
        )
        print(f"resumed {state_path} at epoch {start_epoch} "
              f"(best so far {resumed_best:.4f})")

    tb_writer = None
    if args.tensorboard:
        from clu import metric_writers

        tb_writer = metric_writers.SummaryWriter(str(exp.file("tb")))

    rng_base = jax.random.PRNGKey(args.seed + 1)
    # Resume parity for the non-fused path (code-review r4): Batches keys
    # its shuffle on its own epoch counter, which restarts at 0 in a new
    # process — align it with the true epoch so resumed epochs see the data
    # order an uninterrupted run would have (the fused path already keys
    # shuffle/augmentation on the epoch index).
    train_b.epoch = start_epoch
    best_acc = resumed_best
    loss_m, nfe_m = RunningAverageMeter(), RunningAverageMeter()
    # Backward NFE arrives functionally in the step metrics (the adjoint's
    # nfe_sink gradient side-channel) — real on TPU too, where the old
    # io_callback tap was unimplemented.
    nfe_b_m = RunningAverageMeter()

    profile_left = args.profile
    profile_started = False
    step_idx = 0
    use_fused = args.fused_epoch and not args.profile
    for epoch in range(start_epoch, args.epochs):
        t0 = time.time()
        nfe_b_m.reset()
        tr_acc_sum = tr_count = 0.0
        if use_fused:
            em = trainer.train_epoch(x_train, y_train, epoch)
            for i in range(len(em["loss"])):
                loss_m.update(float(em["loss"][i]))
                nfe_m.update(float(em["nfe"][i]))
                nfe_b_m.update(float(em["nfe_b"][i]))
            tr_acc_sum = float(np.mean(em["acc"])) * args.batch_size * len(
                em["acc"]
            )
            tr_count = args.batch_size * len(em["acc"])
        else:
            # Per-epoch augmentation stream, keyed on the TRUE epoch index:
            # resume at epoch k reproduces the keys an uninterrupted run
            # used at epoch k (one extra tiny dispatch per epoch).
            rng = jax.random.fold_in(rng_base, epoch)
            for images, labels in train_b:
                rng, sub = jax.random.split(rng)
                if profile_left and step_idx == 2:  # skip compile steps
                    jax.profiler.start_trace(str(exp.file("profile")))
                    profile_started = True
                m = trainer.train_batch(images, labels, sub)
                step_idx += 1
                if profile_started and profile_left and step_idx > 2:
                    profile_left -= 1
                    if profile_left == 0:
                        jax.tree.map(lambda a: a.block_until_ready(), m)
                        jax.profiler.stop_trace()
                        profile_started = False
                        print(f"profile written to {exp.file('profile')}")
                loss_m.update(float(m["loss"]))
                nfe_m.update(float(m["nfe"]))
                nfe_b_m.update(float(m["nfe_b"]))
                tr_acc_sum += float(m["acc"]) * len(labels)
                tr_count += len(labels)
        train_time = time.time() - t0

        # Fixed column schema: eval columns are always present (blank when
        # the epoch is not evaluated) so log.csv headers stay aligned for
        # any --eval-every.
        row = {
            "epoch": epoch,
            "train_loss": round(loss_m.avg, 6),
            "train_acc": round(tr_acc_sum / max(tr_count, 1), 6),
            "nfe_f": round(nfe_m.avg, 2),
            "nfe_b": round(nfe_b_m.avg, 2),
            "time_s": round(train_time, 2),
            "test_loss": "",
            "test_acc": "",
            "test_nfe": "",
        }

        if (epoch + 1) % args.eval_every == 0 or epoch == args.epochs - 1:
            if use_fused:
                ev = trainer.evaluate_fused(x_test, y_test)
            else:
                ev = trainer.evaluate(test_b)
            row.update(test_loss=round(ev["loss"], 6),
                       test_acc=round(ev["acc"], 6),
                       test_nfe=round(ev["nfe"], 2))
            if ev["acc"] >= best_acc:
                best_acc = ev["acc"]
                save_checkpoint(exp.file("ckpt_best.msgpack"), trainer.params,
                                trainer.model_cfg,
                                extra={"epoch": epoch, "test_acc": ev["acc"],
                                       "train": exp_params,
                                       "model": args.model})
        # State first, log second: a preemption between the two re-runs the
        # epoch on resume instead of silently resuming stale weights.
        if orbax_state:
            trainer.save_state_orbax(state_path)
        else:
            trainer.save_state(state_path)
        exp.log(row)
        if tb_writer is not None:
            tb_writer.write_scalars(
                epoch, {k: float(v) for k, v in row.items()
                        if k != "epoch" and v != ""}
            )
        print(" | ".join(f"{k}={v}" for k, v in row.items()), flush=True)

    if profile_started:  # run ended before N profiled steps completed
        jax.profiler.stop_trace()
        print(f"profile written to {exp.file('profile')} (short run)")
    save_checkpoint(exp.file("ckpt_last.msgpack"), trainer.params,
                    trainer.model_cfg,
                    extra={"epoch": args.epochs - 1, "test_acc": best_acc,
                           "train": exp_params, "model": args.model})
    print(f"best test acc: {best_acc:.4f}; run dir: {exp.path}")
    return exp.path


def main_population(args, cfg, exp_params):
    """--seeds path: one vmapped population run, one run dir per seed.

    Each member's run dir is identical to what a solo ``--seed S`` run
    would create (same expman identity, log.csv schema, checkpoint and
    train-state formats), so every downstream tool — resume, eval_ckpt,
    extract, the multiseed summariser — works on population-trained runs
    unchanged.
    """
    import jax

    from neural_ode_features_tpu.data import Batches, load_dataset
    from neural_ode_features_tpu.multi import PopulationTrainer
    from neural_ode_features_tpu.utils import (
        Experiment,
        RunningAverageMeter,
        save_checkpoint,
    )

    if args.profile:
        raise SystemExit("--profile is per-run; use a solo --seed run")
    if args.tensorboard:
        raise SystemExit("--tensorboard is per-run; use a solo --seed run")
    if args.state_format != "msgpack":
        raise SystemExit("population training saves per-seed msgpack states")
    if not args.fused_epoch:
        raise SystemExit(
            "--no-fused-epoch is incompatible with --seeds: the population "
            "path IS the vmapped fused-epoch step (and the per-batch path "
            "has different shuffle/augment RNG semantics, so recording "
            "fused_epoch=False would misdescribe the run)")
    seeds = [int(s) for s in args.seeds.split(",") if s]
    if len(set(seeds)) != len(seeds):
        raise SystemExit(f"duplicate seeds in --seeds {args.seeds}")

    exps = []
    for s in seeds:
        exp = Experiment(args.runs_dir, {**exp_params, "seed": s}).create()
        exps.append(exp)
        print(f"run dir (seed {s}): {exp.path}")

    x_train, y_train = load_dataset(args.dataset, "train", args.data_dir,
                                    limit=args.limit)
    x_test, y_test = load_dataset(args.dataset, "test", args.data_dir,
                                  limit=args.limit)
    steps_per_epoch = len(Batches(x_train, y_train, args.batch_size))
    print(f"train {len(x_train)} / test {len(x_test)} images; "
          f"{steps_per_epoch} steps/epoch; devices: {jax.device_count()}; "
          f"population: {len(seeds)} seeds")

    pop = PopulationTrainer(cfg, seeds, steps_per_epoch)

    # Resume only when every member left a state at the same epoch — a
    # mixed population would silently train members different step counts.
    state_paths = [exp.file("train_state.msgpack") for exp in exps]
    start_epoch = 0
    best = [0.0] * len(seeds)
    if args.resume and any(p.exists() for p in state_paths):
        if not all(p.exists() for p in state_paths):
            raise SystemExit(
                "partial population state: some run dirs have "
                "train_state.msgpack and some don't — finish the stragglers "
                "with solo --seed runs or pass --no-resume"
            )
        starts, bests = [], []
        for exp in exps:
            rows = exp.read_log()
            starts.append((int(rows[-1]["epoch"]) + 1) if rows else 0)
            bests.append(max(
                (float(r["test_acc"]) for r in rows if r.get("test_acc")),
                default=0.0,
            ))
        if len(set(starts)) != 1:
            raise SystemExit(
                f"population members resume at different epochs {starts}; "
                "finish them solo or --no-resume"
            )
        start_epoch, best = starts[0], bests
        pop.load_states(state_paths)
        print(f"resumed population at epoch {start_epoch}")

    loss_m = [RunningAverageMeter() for _ in seeds]
    nfe_m = [RunningAverageMeter() for _ in seeds]
    nfe_b_m = [RunningAverageMeter() for _ in seeds]
    import numpy as _np

    for epoch in range(start_epoch, args.epochs):
        t0 = time.time()
        em = pop.train_epoch(x_train, y_train, epoch)
        train_time = time.time() - t0
        do_eval = (epoch + 1) % args.eval_every == 0 or (
            epoch == args.epochs - 1
        )
        evs = pop.evaluate_fused(x_test, y_test) if do_eval else None
        host = pop.host_states()  # one fetch for all K members' saves
        for i, (s, exp) in enumerate(zip(seeds, exps)):
            nfe_b_m[i].reset()
            for j in range(em["loss"].shape[1]):
                loss_m[i].update(float(em["loss"][i, j]))
                nfe_m[i].update(float(em["nfe"][i, j]))
                nfe_b_m[i].update(float(em["nfe_b"][i, j]))
            row = {
                "epoch": epoch,
                "train_loss": round(loss_m[i].avg, 6),
                "train_acc": round(float(_np.mean(em["acc"][i])), 6),
                "nfe_f": round(nfe_m[i].avg, 2),
                "nfe_b": round(nfe_b_m[i].avg, 2),
                "time_s": round(train_time, 2),
                "test_loss": "",
                "test_acc": "",
                "test_nfe": "",
            }
            if evs is not None:
                ev = evs[i]
                row.update(test_loss=round(ev["loss"], 6),
                           test_acc=round(ev["acc"], 6),
                           test_nfe=round(ev["nfe"], 2))
                if ev["acc"] >= best[i]:
                    best[i] = ev["acc"]
                    save_checkpoint(
                        exp.file("ckpt_best.msgpack"),
                        pop.params_for(i, host=host),
                        pop.model_cfg,
                        extra={"epoch": epoch, "test_acc": ev["acc"],
                               "train": {**exp_params, "seed": s},
                               "model": args.model})
            pop.save_state_for(i, exp.file("train_state.msgpack"),
                               host=host)
            exp.log(row)
            print(f"seed {s} | " + " | ".join(f"{k}={v}"
                                              for k, v in row.items()),
                  flush=True)
    host = pop.host_states()
    for i, (s, exp) in enumerate(zip(seeds, exps)):
        save_checkpoint(exp.file("ckpt_last.msgpack"),
                        pop.params_for(i, host=host),
                        pop.model_cfg,
                        extra={"epoch": args.epochs - 1, "test_acc": best[i],
                               "train": {**exp_params, "seed": s},
                               "model": args.model})
        print(f"seed {s}: best test acc {best[i]:.4f}; run dir: {exp.path}")
    return [exp.path for exp in exps]


if __name__ == "__main__":
    main()
