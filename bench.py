#!/usr/bin/env python
"""Headline benchmark: CIFAR-10 ODE-Net inference throughput at rtol=1e-3.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "img/s/chip", "vs_baseline": R}

``value`` is images/sec/chip on this machine's accelerator (per-sample
adaptive dopri5, whole solve on-device).  ``vs_baseline`` is the ratio
against the CPU torchdiffeq-style reference execution model, measured live
with the torch oracle (host-loop dopri5, batch-global control) on identical
weights — the BASELINE.md "oracle-derived" protocol (the real reference
repo's code is unavailable: empty mount, zero egress; SURVEY.md §0).
North-star target: ratio ≥ 10 (BASELINE.json).

Capture hardening (VERDICT r2 #1/#4/#5 — round 2's driver artifact was
rc=124/parsed=null because a stalled TPU-tunnel dispatch produced no output
for ≥9 min):

* **Supervisor + retry.** By default ``main()`` runs the measurement in a
  child process (``BENCH_INNER=1``).  If the child stalls past its budget it
  is killed and retried ONCE; if that fails too, the supervisor emits the
  best partial JSON recorded so far with ``"incomplete": true``.  Something
  parseable is printed on every path — with one deliberate exception:
  invalid FLAGS (e.g. ``--hidden`` not a multiple of 32) exit 2 with
  argparse's usage message and no JSON, before any attempt starts.  A
  caller that varies flags must treat rc=2/no-JSON as "fix the invocation",
  not as a salvageable run.
* **Deadline.** ``BENCH_DEADLINE_S`` (default 480 s) bounds the whole run;
  the child also runs an internal watchdog thread that dumps partial JSON
  and exits just before its own budget expires (belt and braces — works
  even when bench is invoked with ``BENCH_INNER=1`` directly).
* **Persistent compile cache** at ``.jax_cache/`` so warm reruns skip the
  1-8 min TPU compile.
* **Timestamped stderr progress** at every stage so a killed run's tail is
  diagnosable.
* **Variance discipline.**  Per-repetition throughputs are reported as
  ``value`` (MEDIAN of the repetitions — the robust headline the r2/r3
  verdicts asked for) plus ``value_best`` and ``value_band`` [min, max].
  Rounds 1-3 published best-of as ``value``; from round 4 the median IS
  the headline and best lives in ``value_best``/``value_band``.
* **Hardened CPU denominator.**  torch threads pinned (1-CPU box),
  ``cpu_ips`` is the best per-batch throughput (capacity estimate — the
  conservative choice for ``vs_baseline`` and far more stable under host
  load than a median that collapses when the single core is shared);
  the median/spread and 1-min load average are recorded, and a degenerate
  spread (>4x min-to-max after the best-of protocol) nulls ``vs_baseline``
  with an explicit reason instead of publishing a meaningless ratio.

Flags let the driver/judge vary batch size, dtype and sample counts;
defaults keep total runtime well under the deadline on a warm cache.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import threading
import time

import numpy as np

_T0 = time.monotonic()
CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache")


def log(msg: str) -> None:
    """Timestamped progress line on stderr (flushed immediately)."""
    print(f"[bench +{time.monotonic() - _T0:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--iters", type=int, default=32)
    p.add_argument("--repeats", type=int, default=6,
                   help="timing repetitions; value=median, plus "
                        "value_best / value_band over the repetitions "
                        "(the chip/tunnel contention band was measured at "
                        "64-176k img/s for identical work)")
    p.add_argument("--warmup", type=int, default=None,
                   help="deprecated alias for --repeats")
    p.add_argument("--tol", type=float, default=1e-3)
    p.add_argument("--method", default="dopri5",
                   help="adaptive solver (dopri5/tsit5/bosh3/adams/...)")
    p.add_argument("--run", default=None,
                   help="benchmark a trained checkpoint (run dir or .msgpack)"
                        " instead of the deterministic random init")
    p.add_argument("--hidden", type=int, default=64,
                   help="ODEfunc channel width (untrained protocol only; "
                        "the CPU oracle is built at the same width). The "
                        "reference model is 64; wider widths measure how "
                        "MFU scales when the MXU actually has work")
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 dynamics (default f32 for NFE parity)")
    p.add_argument("--controller", default="i", choices=["i", "pi"],
                   help="step-size controller: 'i' (reference NFE parity, "
                        "default) or 'pi' (proportional-integral — fewer "
                        "rejections; fewer NFE on stiff dynamics)")
    p.add_argument("--pallas", action="store_true",
                   help="fused Pallas ODEfunc kernel")
    p.add_argument("--fused-rk", action="store_true",
                   help="fused Pallas RK-step kernel (whole dopri5 step "
                        "VMEM-resident)")
    p.add_argument("--pool", type=int, default=0,
                   help="stream a pool of POOL DISTINCT images through "
                        "batch-size batches (rounded up to a multiple) "
                        "instead of repeating one batch — real per-sample "
                        "NFE heterogeneity with --run (trained weights). "
                        "0 = the round-1 single-batch protocol")
    p.add_argument("--nfe-sort", action="store_true",
                   help="with --pool: NFE-bucketed batching — probe "
                        "per-sample NFE at 10x-loose tolerance, argsort "
                        "on device, stream NFE-homogeneous batches (the "
                        "per-sample while_loop pays each batch's max NFE; "
                        "mixed batches waste masked lanes). Probe cost is "
                        "included in the reported throughput")
    p.add_argument("--cpu-batches", type=int, default=6,
                   help="oracle batches for the vs_baseline denominator; "
                        "the BEST per-batch throughput is used as the "
                        "capacity estimate (stable under load on this "
                        "1-CPU box; median+spread also reported)")
    p.add_argument("--cpu-batch-size", type=int, default=32)
    p.add_argument("--skip-baseline", action="store_true")
    p.add_argument("--cpu", action="store_true",
                   help="run the JAX side on CPU too (debug)")
    args = p.parse_args(argv)
    if args.warmup is not None:
        args.repeats = args.warmup  # alias: honor the requested count
    if args.hidden % 32 != 0 or args.hidden <= 0:
        p.error(f"--hidden {args.hidden}: must be a positive multiple of 32"
                " (GroupNorm groups=32 in the reference architecture)")
    return args


# ---------------------------------------------------------------------------
# Partial-result plumbing: the inner process keeps PARTIAL up to date after
# every milestone and mirrors it to BENCH_PARTIAL_PATH so the supervisor can
# salvage a killed run.
# ---------------------------------------------------------------------------

PARTIAL: dict = {
    "metric": "images_per_sec_per_chip_cifar10_odenet_inference_rtol1e-3",
    "value": None,
    "unit": "img/s/chip",
    "vs_baseline": None,
    "incomplete": True,
    "stage": "start",
}
_PARTIAL_LOCK = threading.Lock()


def milestone(stage: str, **updates) -> None:
    with _PARTIAL_LOCK:
        PARTIAL["stage"] = stage
        PARTIAL.update(updates)
        snapshot = dict(PARTIAL)
    log(f"milestone: {stage}")
    path = os.environ.get("BENCH_PARTIAL_PATH")
    if path:
        try:
            tmp = path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(snapshot, f)
            os.replace(tmp, path)
        except OSError as e:  # never let bookkeeping kill the bench
            log(f"partial-file write failed: {e}")


def _start_watchdog(deadline_s: float) -> None:
    """Daemon thread: if the measurement outlives its budget (e.g. a hung
    TPU-tunnel dispatch that no in-process mechanism can interrupt), print
    the current partial JSON and hard-exit so *something* parseable always
    reaches stdout."""

    def fire():
        time.sleep(deadline_s)
        with _PARTIAL_LOCK:
            snapshot = dict(PARTIAL)
        snapshot["incomplete"] = True
        snapshot["watchdog_fired_after_s"] = round(deadline_s, 1)
        log(f"WATCHDOG: deadline {deadline_s:.0f}s hit at stage "
            f"'{snapshot.get('stage')}' — emitting partial JSON")
        print(json.dumps(snapshot), flush=True)
        os._exit(3)

    threading.Thread(target=fire, daemon=True).start()


# ---------------------------------------------------------------------------
# Supervisor: run the measurement in a child, retry once on stall, always
# print a JSON line.
# ---------------------------------------------------------------------------

def supervise(argv) -> dict:
    # Validate flags HERE, before spawning anything: a usage error must exit
    # loudly with argparse's message, not surface as a salvaged partial JSON
    # from a dead child.
    parse_args(argv)
    deadline = float(os.environ.get("BENCH_DEADLINE_S", "480"))
    partial_path = os.path.join(
        os.environ.get("TMPDIR", "/tmp"), f"bench_partial_{os.getpid()}.json"
    )
    child_argv = list(argv) if argv is not None else sys.argv[1:]

    # The child runs detached (start_new_session — see below), so an external
    # SIGTERM/SIGINT to this supervisor must not orphan it on the chip.
    import signal

    live_child: list = []

    def _reap(signum, frame):
        for c in live_child:
            try:
                c.kill()
            except OSError:
                pass
        os._exit(128 + signum)

    for sig in (signal.SIGTERM, signal.SIGINT):
        signal.signal(sig, _reap)

    def remaining():
        return deadline - (time.monotonic() - _T0)

    best_partial = None
    for attempt in (1, 2):
        budget = remaining() - 8  # leave room to salvage + print
        if budget < 12:
            log(f"attempt {attempt}: only {budget:.0f}s left — skipping")
            break
        if attempt == 1 and budget > 150:
            # Keep a real slice of the deadline for the retry.
            budget = max(budget * 0.62, budget - 170)
        env = dict(os.environ,
                   BENCH_INNER="1",
                   BENCH_PARTIAL_PATH=partial_path,
                   BENCH_CHILD_DEADLINE_S=str(max(budget - 6, 8)))
        log(f"attempt {attempt}: budget {budget:.0f}s "
            f"(deadline {deadline:.0f}s)")
        # start_new_session=True is LOAD-BEARING: the axon TPU tunnel's
        # first device->host fetch takes 60-300+ s (vs ~1 s) when the
        # client shares a session/process group with a python parent —
        # measured minimally this round (same op: 283 s in-pgid vs 1.2 s
        # with a fresh session).  This is the root cause of the round-2
        # driver's rc=124/no-output bench artifact.  The supervisor itself
        # never touches the TPU, so it insulates the measurement from
        # however the caller spawned *us*.
        child = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), *child_argv],
            stdout=subprocess.PIPE, stderr=sys.stderr, env=env, text=True,
            start_new_session=True,
        )
        live_child[:] = [child]
        try:
            out, _ = child.communicate(timeout=budget)
        except subprocess.TimeoutExpired:
            child.kill()
            child.communicate()
            log(f"attempt {attempt}: child stalled past {budget:.0f}s budget "
                f"— killed (tunnel hang?); "
                + ("retrying once" if attempt == 1 else "giving up"))
            continue
        except BaseException:
            child.kill()  # never leave a detached child holding the chip
            child.communicate()
            raise
        parsed = None
        for line in reversed((out or "").splitlines()):
            line = line.strip()
            if line.startswith("{"):
                try:
                    parsed = json.loads(line)
                except json.JSONDecodeError:
                    continue
                break
        if parsed is not None and not parsed.get("incomplete"):
            print(json.dumps(parsed), flush=True)
            return parsed
        if parsed is not None:
            # Child's own watchdog fired (e.g. a stalled compile): keep the
            # partial as a fallback but retry for a complete result — the
            # observed tunnel-hang failure mode resolves on a fresh process.
            best_partial = parsed
            log(f"attempt {attempt}: child returned INCOMPLETE JSON at "
                f"stage '{parsed.get('stage')}'"
                + (" — retrying once" if attempt == 1 else ""))
        else:
            log(f"attempt {attempt}: child exited rc={child.returncode} with"
                " no JSON line"
                + (" — retrying once" if attempt == 1 else ""))

    # Salvage: the FURTHEST-stage partial any attempt recorded (stdout
    # partial from attempt 1 vs the mirrored partial file, which the later
    # attempt overwrites), else the skeleton.  A measured value always
    # beats a value-less record; between two measured records the later
    # milestone wins.
    stage_rank = {"start": 0, "import-jax": 1, "baseline-start": 2,
                  "baseline-done": 3, "model-ready": 4, "null-dispatch": 5,
                  "compiled": 6, "first-timing": 7, "timed": 8, "done": 9}

    def _score(rec):
        if rec is None:
            return (-1, -1)
        return (1 if rec.get("value") is not None else 0,
                stage_rank.get(rec.get("stage"), 0))

    file_partial = None
    try:
        with open(partial_path) as f:
            file_partial = json.load(f)
    except (OSError, json.JSONDecodeError):
        pass
    result = max((dict(PARTIAL), file_partial, best_partial), key=_score)
    result["incomplete"] = True
    result.setdefault("stage", "no-attempt")
    log(f"emitting salvaged partial JSON (stage={result.get('stage')})")
    print(json.dumps(result), flush=True)
    return result


# ---------------------------------------------------------------------------
# The measurement itself (runs in the child / BENCH_INNER process).
# ---------------------------------------------------------------------------

def inner_main(argv=None):
    args = parse_args(argv)
    child_deadline = os.environ.get("BENCH_CHILD_DEADLINE_S")
    if child_deadline:
        _start_watchdog(float(child_deadline))
    if os.environ.get("BENCH_DEBUG_STACKS"):
        import faulthandler

        faulthandler.dump_traceback_later(
            int(os.environ["BENCH_DEBUG_STACKS"]), repeat=True,
            file=sys.stderr)

    try:
        load1 = round(os.getloadavg()[0], 2)
    except OSError:
        load1 = None
    milestone("import-jax", host_load_1min=load1)

    import jax

    # Persistent compilation cache: warm reruns skip the 1-8 min compile.
    # The helper owns the mandatory gates (XLA:CPU AOT entries are
    # machine-feature-specific — see utils/compile_cache.py).
    from neural_ode_features_tpu.utils import enable_tpu_compile_cache

    if not enable_tpu_compile_cache(CACHE_DIR, cpu=args.cpu) and not args.cpu:
        log("compile cache unavailable")

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from neural_ode_features_tpu.models import (
        ModelConfig,
        init_odenet,
        odenet_logits,
    )

    import dataclasses

    # Parameters are built ON THE CPU BACKEND so the torch-oracle baseline
    # below can run before the first TPU contact: axon first-contact latency
    # measured anywhere from 0.9 s to >340 s this round, so every
    # TPU-independent number must land in the partial record first.
    cpu_dev = jax.devices("cpu")[0]
    with jax.default_device(cpu_dev):
        if args.run:
            from neural_ode_features_tpu.utils import (
                load_checkpoint,
                resolve_checkpoint,
            )

            params, cfg0, _ = load_checkpoint(resolve_checkpoint(args.run))
            cfg = dataclasses.replace(
                cfg0,
                tol=args.tol,
                method=args.method,
                controller=args.controller,
                error_control="per_sample",
                adjoint=False,
                compute_dtype="bfloat16" if args.bf16 else cfg0.compute_dtype,
                use_pallas=args.pallas,
                use_fused_rk=args.fused_rk,
            )
        else:
            cfg = ModelConfig(
                in_channels=3,
                hidden=args.hidden,
                tol=args.tol,
                method=args.method,
                controller=args.controller,
                error_control="per_sample",
                compute_dtype="bfloat16" if args.bf16 else "float32",
                use_pallas=args.pallas,
                use_fused_rk=args.fused_rk,
            )
            params = init_odenet(jax.random.PRNGKey(7), cfg)
        params = jax.device_get(params)  # plain numpy pytree

    rng = np.random.default_rng(0)
    side = 28 if cfg.in_channels == 1 else 32
    x_np = rng.normal(
        size=(args.batch_size, side, side, cfg.in_channels)
    ).astype(np.float32)

    # Effective fused-RK state (the model gate silently falls back to jnp
    # for non-dopri5 / bf16 / unsupported shapes — report what actually
    # runs, not the flag).  The ODE-state shape comes from eval_shape on
    # the REAL stem — the old conv-stem constant (28→6, 32→7) was wrong
    # for res-downsampling checkpoints (7/8), so the reported
    # fused_rk/pallas flags could disagree with what ran (code-review r4).
    from neural_ode_features_tpu.models.odenet import (
        fused_rk_eligible,
        stem_apply,
    )

    hidden_shape = tuple(jax.eval_shape(
        lambda p, v: stem_apply(p, v, cfg), params["stem"],
        jax.ShapeDtypeStruct(x_np.shape, jnp.float32)).shape)
    fused_rk_active = fused_rk_eligible(cfg, hidden_shape, jnp.float32)
    if args.fused_rk and not fused_rk_active:
        log("NOTE: --fused-rk requested but the model gate falls back to "
            "the jnp path for this config (method/dtype/shape)")

    # Same effective-state reporting for --pallas: the per-ODEfunc kernel
    # gate (models/odenet.py) silently falls back to jnp for bf16 or
    # unsupported shapes (e.g. --hidden > 512 fails pallas_supported).
    from neural_ode_features_tpu.kernels.odefunc_pallas import (
        pallas_supported,
    )

    pallas_active = bool(
        args.pallas
        and cfg.compute_dtype == "float32"
        and pallas_supported(
            jax.ShapeDtypeStruct(hidden_shape, jnp.float32),
            cfg.groups,
        )
    )
    if args.pallas and not pallas_active:
        log("NOTE: --pallas requested but the kernel gate falls back to "
            "the jnp path for this config (dtype/width/VMEM budget)")

    # --- CPU-oracle denominator FIRST (no TPU dependency) ------------------
    vs_baseline = None
    baseline_note = None
    cpu_ips = cpu_ips_median = cpu_ips_spread = None
    if not args.skip_baseline:
        # Stage marker BEFORE the host-loop oracle: a watchdog JSON stuck at
        # 'baseline-start' means the one-CPU host is starved (oracle still
        # running), not a tunnel stall — measured failure mode when a test
        # suite shares the box.
        milestone("baseline-start")
        try:
            import torch

            from neural_ode_features_tpu.oracle.torch_ref import (
                build_torch_odenet,
                load_jax_params_into_torch,
            )

            # Pin threads explicitly (VERDICT r2 weak #2): this box has ONE
            # CPU; an unpinned default can still oversubscribe via inter-op
            # pools and the measured spread was [16.8, 89.9] img/s under
            # load.
            torch.set_num_threads(1)
            try:
                torch.set_num_interop_threads(1)
            except RuntimeError:
                pass  # already initialised
            tm = build_torch_odenet(
                in_channels=cfg.in_channels,
                hidden=cfg.hidden,
                groups=cfg.groups,
            )
            load_jax_params_into_torch(tm, params)
            tm.eval()
            xc = torch.from_numpy(
                x_np[: args.cpu_batch_size].transpose(0, 3, 1, 2)
            )
            # BEST per-batch throughput = capacity estimate.  Under host
            # load the per-batch times are contaminated upward by scheduler
            # sharing; the fastest batch is the least-contaminated sample
            # and is the CONSERVATIVE choice for vs_baseline (largest
            # denominator).  Median + spread still reported for diagnosis.
            batch_dts = []
            with torch.no_grad():
                tm(xc, rtol=args.tol, atol=args.tol)  # warmup
                for i in range(args.cpu_batches):
                    t0 = time.perf_counter()
                    _, nfe_t = tm(xc, rtol=args.tol, atol=args.tol)
                    batch_dts.append(time.perf_counter() - t0)
            per_batch_ips = args.cpu_batch_size / np.asarray(batch_dts)
            cpu_ips = float(per_batch_ips.max())
            cpu_ips_median = float(np.median(per_batch_ips))
            cpu_ips_spread = [float(per_batch_ips.min()),
                              float(per_batch_ips.max())]
            if cpu_ips_spread[1] / max(cpu_ips_spread[0], 1e-9) > 4.0:
                # Even best-of can't be trusted when every sample was taken
                # on a thrashing host; refuse to publish the ratio.
                baseline_note = (
                    "degenerate spread "
                    f"{[round(v, 1) for v in cpu_ips_spread]} img/s "
                    "(host under load) — vs_baseline withheld"
                )
                log(f"baseline: {baseline_note}")
            milestone("baseline-done",
                      cpu_ips=round(cpu_ips, 2),
                      cpu_ips_median=round(cpu_ips_median, 2),
                      cpu_ips_spread=[round(v, 2) for v in cpu_ips_spread])
        except Exception as e:  # torch missing or oracle failure
            baseline_note = f"baseline measurement failed: {e}"
            log(baseline_note)

    x = jnp.asarray(x_np)  # first TPU contact starts here
    params = jax.device_put(params)  # once — not per timing rep

    shape_name = "mnist" if cfg.in_channels == 1 else "cifar10"
    suffix = "" if cfg.hidden == 64 else f"_hidden{cfg.hidden}"
    if args.pool:
        n_batches = -(-args.pool // args.batch_size)
        suffix += f"_pool{n_batches * args.batch_size}" + (
            "_nfesort" if args.nfe_sort else ""
        )
    milestone(
        "model-ready",
        metric=(f"images_per_sec_per_chip_{shape_name}"
                f"_odenet_inference_rtol1e-3{suffix}"),
        batch_size=args.batch_size,
        backend=jax.default_backend(),
        compute_dtype=cfg.compute_dtype,
        pallas=pallas_active,
        fused_rk=fused_rk_active,
        method=args.method,
    )

    # The whole timing loop runs inside ONE jitted lax.scan dispatch: on this
    # machine the remote-TPU tunnel costs ~0.6 s per dispatch, which would
    # swamp per-call timing for a model this small.  Iterations are chained
    # through a data dependency (the previous logits perturb the next input)
    # so nothing can be elided; elapsed time is closed by device_get and the
    # measured null-dispatch overhead is subtracted.
    from jax import lax

    null = jax.jit(lambda s: s + 1.0)
    float(jax.device_get(null(jnp.zeros(()))))
    t0 = time.perf_counter()
    float(jax.device_get(null(jnp.zeros(()))))
    overhead = time.perf_counter() - t0
    milestone("null-dispatch", dispatch_overhead_s=round(overhead, 3))

    reps = max(args.repeats, 2)
    pool_extra = {}
    rep_ips: list[float] = []
    if args.pool:
        # Pool protocol (VERDICT r1 #3): stream DISTINCT images so per-sample
        # NFE actually varies (trained weights + noise inputs give a real
        # spread), exposing the straggler cost that the single-repeated-batch
        # protocol never exercises.  One scan dispatch gathers each batch
        # from the staged pool by an index matrix; --nfe-sort reorders that
        # matrix by a 10x-loose-tolerance NFE probe (argsort on device) so
        # every batch is NFE-homogeneous.
        n_batches = -(-args.pool // args.batch_size)
        pool_n = n_batches * args.batch_size
        x_pool = jnp.asarray(
            rng.normal(size=(pool_n, side, side, cfg.in_channels))
            .astype(np.float32)
        )

        def pool_loop(p, pool, idx):
            # NFE accumulator and the liveness term ride SEPARATE carry
            # slots (ADVICE r2: folding mean(logits)*1e-12 into the NFE
            # accumulator skewed the reported mean_nfe).
            def body(carry, sel):
                nfe_acc, live_acc = carry
                logits, stats = odenet_logits(p, pool[sel], cfg)
                return (nfe_acc + jnp.mean(stats.nfe.astype(jnp.float32)),
                        live_acc + jnp.mean(logits)), None

            (nfe_acc, live_acc), _ = lax.scan(
                body, (jnp.zeros(()), jnp.zeros(())), idx
            )
            return nfe_acc / idx.shape[0] + live_acc * 1e-20

        run_pool = jax.jit(pool_loop)
        idx0 = jnp.arange(pool_n, dtype=jnp.int32).reshape(
            n_batches, args.batch_size
        )

        def time_pass(idx, extra_dt=0.0):
            # extra_dt: per-pass cost already paid outside this loop (the
            # NFE probe before a sorted pass) — the salvage milestone must
            # include it, or a watchdog kill mid-sorted-timing reports a
            # probe-free img/s the completed run would never print
            # (code-review r4, second pass).
            dts, nfe = [], 0.0
            for i in range(reps):
                t0 = time.perf_counter()
                out = run_pool(params, x_pool, idx)
                nfe = float(jax.device_get(out))
                dts.append(max(time.perf_counter() - t0 - overhead, 1e-9))
                if i == 0:
                    # Value-bearing milestone, like the non-pool branch's
                    # "first-timing": a watchdog kill mid-timing salvages a
                    # real value instead of null (code-review r4).
                    milestone("first-timing",
                              value=round(pool_n / (dts[0] + extra_dt), 2),
                              mean_nfe=round(nfe, 1))
            return dts, nfe

        float(jax.device_get(run_pool(params, x_pool, idx0)))  # compile
        milestone("compiled")
        dts_unsorted, mean_nfe = time_pass(idx0)
        dt_unsorted = min(dts_unsorted)
        pool_extra = {
            "pool": pool_n,
            "pool_ips_unsorted": round(pool_n / dt_unsorted, 2),
        }
        rep_dts = dts_unsorted

        if args.nfe_sort:
            cfg_loose = dataclasses.replace(
                cfg, tol=min(args.tol * 10, 1e-1)
            )

            def probe_loop(p, pool, idx):
                def body(_, sel):
                    _, stats = odenet_logits(p, pool[sel], cfg_loose)
                    return None, stats.nfe.astype(jnp.int32)

                _, nfes = lax.scan(body, None, idx)
                return nfes.reshape(-1)

            probe = jax.jit(probe_loop)
            nfe_probe = jax.device_get(probe(params, x_pool, idx0))  # compile
            probe_dts = []
            for _ in range(2):  # best-of-2: match the solve passes' protocol
                t0 = time.perf_counter()
                nfe_probe = jax.device_get(probe(params, x_pool, idx0))
                probe_dts.append(
                    max(time.perf_counter() - t0 - overhead, 1e-9))
            probe_dt = min(probe_dts)
            order = np.argsort(nfe_probe, kind="stable").astype(np.int32)
            idx_sorted = jnp.asarray(order.reshape(n_batches,
                                                   args.batch_size))
            float(jax.device_get(run_pool(params, x_pool, idx_sorted)))
            dts_sorted, mean_nfe = time_pass(idx_sorted, extra_dt=probe_dt)
            dt_sorted = min(dts_sorted)
            # Honest accounting: the probe is real work — the headline
            # sorted throughput includes it, amortised over one pool pass.
            rep_dts = [d + probe_dt for d in dts_sorted]
            pool_extra.update(
                pool_ips_sorted=round(pool_n / dt_sorted, 2),
                pool_ips_sorted_with_probe=round(
                    pool_n / (dt_sorted + probe_dt), 2),
                probe_s=round(probe_dt, 3),
                probe_nfe_spread=[int(nfe_probe.min()),
                                  int(nfe_probe.max())],
            )
        rep_ips = [pool_n / d for d in rep_dts]
    else:
        def bench_loop(p, xx, n_iters):
            def body(carry, _):
                x_i, nfe_acc = carry
                logits, stats = odenet_logits(p, x_i, cfg)
                x_next = xx + jnp.mean(logits) * 1e-6
                return (x_next,
                        nfe_acc + jnp.mean(stats.nfe.astype(jnp.float32))), None

            (x_f, nfe_sum), _ = lax.scan(body, (xx, jnp.zeros(())), None,
                                         length=n_iters)
            return jnp.mean(x_f), nfe_sum / n_iters

        run = jax.jit(bench_loop, static_argnums=2)
        float(jax.device_get(run(params, x, args.iters)[0]))  # compile
        milestone("compiled")

        mean_nfe = 0.0
        for i in range(reps):
            t0 = time.perf_counter()
            out, nfe_mean = run(params, x, args.iters)
            float(jax.device_get(out))
            dt = max(time.perf_counter() - t0 - overhead, 1e-9)
            rep_ips.append(args.batch_size * args.iters / dt)
            mean_nfe = float(jax.device_get(nfe_mean))
            if i == 0:  # a usable value exists from here on
                milestone("first-timing",
                          value=round(rep_ips[0], 2),
                          mean_nfe=round(mean_nfe, 1))

    rep_arr = np.asarray(rep_ips)
    # Headline = MEDIAN of repeats (robust under the measured 2.8x
    # contention band); best-of moves to value_best/value_band (r3 Weak #3).
    ips = float(np.median(rep_arr))
    ips_best = float(rep_arr.max())
    milestone("timed",
              value=round(ips, 2),
              value_best=round(ips_best, 2),
              value_band=[round(float(rep_arr.min()), 2),
                          round(float(rep_arr.max()), 2)],
              repeats=len(rep_ips),
              mean_nfe=round(mean_nfe, 1))

    if cpu_ips and baseline_note is None:
        vs_baseline = ips / cpu_ips

    # Model-FLOPs utilisation (VERDICT r1 #9): useful FLOPs at the measured
    # mean NFE over the chip's bf16 peak (utils/flops.py documents why bf16
    # peak is the denominator for f32 too).
    from neural_ode_features_tpu.utils import (
        odenet_flops_per_image,
        peak_flops_per_chip,
    )

    flops = odenet_flops_per_image(cfg, side, mean_nfe)
    achieved = flops["total"] * ips  # FLOP/s (one chip)
    peak = peak_flops_per_chip(jax.devices()[0].device_kind)
    mfu = (achieved / peak) if peak else None

    try:
        load1_end = round(os.getloadavg()[0], 2)
    except OSError:
        load1_end = None

    result = {
        "metric": (f"images_per_sec_per_chip_{shape_name}"
                   f"_odenet_inference_rtol1e-3{suffix}"),
        "value": round(ips, 2),
        "unit": "img/s/chip",
        "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
        "value_best": round(ips_best, 2),
        "value_band": [round(float(rep_arr.min()), 2),
                       round(float(rep_arr.max()), 2)],
        "repeats": len(rep_ips),
        "mean_nfe": round(mean_nfe, 1),
        "batch_size": args.batch_size,
        "backend": jax.default_backend(),
        "compute_dtype": cfg.compute_dtype,
        "pallas": pallas_active,
        "fused_rk": fused_rk_active,
        "method": args.method,
        "controller": args.controller,
        "tflops": round(achieved / 1e12, 3),
        "mfu": round(mfu, 4) if mfu is not None else None,
        "cpu_ips": round(cpu_ips, 2) if cpu_ips else None,
        "cpu_ips_median": (round(cpu_ips_median, 2)
                           if cpu_ips_median else None),
        "cpu_ips_spread": (
            [round(v, 2) for v in cpu_ips_spread] if cpu_ips_spread else None
        ),
        "host_load_1min": [load1, load1_end],
        **pool_extra,
    }
    if baseline_note:
        result["baseline_note"] = baseline_note
    milestone("done", **{k: v for k, v in result.items()
                         if k not in ("stage",)})
    with _PARTIAL_LOCK:
        PARTIAL.pop("incomplete", None)
        PARTIAL.pop("stage", None)
    print(json.dumps(result), flush=True)
    return result


def main(argv=None):
    if os.environ.get("BENCH_INNER") == "1" or os.environ.get("BENCH_NO_SUPERVISOR") == "1":
        return inner_main(argv)
    return supervise(argv)


if __name__ == "__main__":
    main()
