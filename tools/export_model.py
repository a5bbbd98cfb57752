#!/usr/bin/env python
"""AOT export / serve a trained model as a self-contained StableHLO artifact.

The TPU-native deployment path: ``jax.export`` serialises the traced +
lowered inference function (StableHLO + calling convention) so a serving
process can run it WITHOUT the model code, config plumbing, or tracing —
``jax.export.deserialize(blob).call(x)`` is the whole server loop.  This is
the jax analogue of the torch ``torch.jit.trace``/ONNX deployment story the
reference leaves to its consumers (reference: none — SURVEY.md §2.3 notes
the reference ships no serving layer; this EXCEEDS parity).

Modes:
  export  load a run dir's best checkpoint, export logits(x) at a fixed
          batch shape, write <out>.nodeexport + a sidecar JSON
          (shape/dtype/config + sha256 of the blob).
  run     deserialize a .nodeexport and execute it on the current backend
          against the checkpoint's own logits — the deployment smoke test
          (prints max|diff| and a throughput estimate).
  export-compiled
          AOT-compile logits(x) on the CURRENT backend and write a
          ``.npexec`` artifact (PJRT serialized executable + meta +
          sample input/expected logits) for the native C++ serving host
          ``native/pjrt_serve`` — zero Python in the serving process.
          Platform-specific: export on the backend that will serve.

Examples:
  python tools/export_model.py export --run runs_tpu/<dir> --batch 256
  python tools/export_model.py run --artifact model.nodeexport \
      --run runs_tpu/<dir>   # parity check vs the live model
"""

from __future__ import annotations

import argparse
import hashlib
import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def _load(run_dir: Path, ckpt_name: str):
    from neural_ode_features_tpu.utils.checkpoint import (
        load_checkpoint,
        resolve_checkpoint,
    )

    params, cfg, extra = load_checkpoint(
        resolve_checkpoint(run_dir, name=ckpt_name))
    return params, cfg, extra


def _logits_fn(params, cfg, model: str):
    import jax.numpy as jnp

    if model == "resnet":
        from neural_ode_features_tpu.models import resnet_logits

        def fn(x):
            return resnet_logits(params, x, cfg)
    else:
        from neural_ode_features_tpu.models import odenet_logits

        def fn(x):
            logits, _ = odenet_logits(params, x, cfg, adjoint=False)
            return logits
    return fn


def do_export(args):
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    params, cfg, extra = _load(Path(args.run), args.ckpt)
    model = extra.get("model", "odenet")
    side = 32 if cfg.in_channels == 3 else 28
    shape = (args.batch, side, side, cfg.in_channels)
    fn = _logits_fn(params, cfg, model)

    exported = jexport.export(jax.jit(fn))(
        jax.ShapeDtypeStruct(shape, jnp.float32))
    blob = exported.serialize()

    out = Path(args.out or (Path(args.run) / f"model_b{args.batch}.nodeexport"))
    out.write_bytes(blob)
    meta = {
        "input_shape": list(shape),
        "input_dtype": "float32",
        "model": model,
        "platforms": list(exported.platforms),
        "sha256": hashlib.sha256(blob).hexdigest(),
        "bytes": len(blob),
        "config": {k: v for k, v in vars(cfg).items()
                   if not k.startswith("_")},
    }
    out.with_suffix(out.suffix + ".json").write_text(json.dumps(meta, indent=2))
    print(f"exported {out} ({len(blob)/1e6:.2f} MB, "
          f"platforms={meta['platforms']})")
    print(json.dumps({"artifact": str(out), **{k: meta[k] for k in
                                               ("bytes", "sha256")}}))


def do_export_compiled(args):
    """AOT-compile the inference function on the CURRENT backend and write a
    native serving artifact: the PJRT serialized executable + meta JSON +
    a deterministic sample input/expected-logits pair.

    The artifact is consumed by ``native/pjrt_serve`` (a C++ host runner
    that dlopens the PJRT plugin directly — zero Python in the serving
    process).  Serialized executables are platform- and version-specific:
    export on the same backend that will serve (here: the axon TPU plugin).
    reference: none — SURVEY.md §2.3 (the reference ships no native layer
    or serving runtime; this EXCEEDS parity).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    if args.cpu:
        # CPU-pinned artifacts can't serve on the TPU (serialized
        # executables are platform-specific) but are useful offline —
        # inspection, the CPU round-trip test — without paying a TPU
        # session claim.
        jax.config.update("jax_platforms", "cpu")

    params, cfg, extra = _load(Path(args.run), args.ckpt)
    model = extra.get("model", "odenet")
    side = 32 if cfg.in_channels == 3 else 28
    shape = (args.batch, side, side, cfg.in_channels)
    fn = _logits_fn(params, cfg, model)

    if args.chain > 1:
        # Throughput variant: one dispatch solves `chain` batches via
        # lax.scan (bench.py's chained protocol) so a native host can
        # drive the chip at full rate instead of per-request latency
        # (~33 ms relay overhead per dispatch is amortised over
        # chain*batch images).
        inner = fn
        shape = (args.chain,) + shape

        def fn(xs):
            _, ys = jax.lax.scan(lambda c, x: (c, inner(x)), None, xs)
            return ys

    t0 = time.perf_counter()
    # Timestamped stderr progress: a stalled export (axon first-contact
    # band is 0.9 s–340 s+) must be diagnosable from the log tail.
    print(f"[{time.strftime('%H:%M:%S')}] lowering+compiling on "
          f"{jax.default_backend()} (first TPU contact can stall minutes)",
          file=sys.stderr, flush=True)
    compiled = jax.jit(fn).lower(
        jax.ShapeDtypeStruct(shape, jnp.float32)).compile()
    print(f"[{time.strftime('%H:%M:%S')}] compiled "
          f"({time.perf_counter()-t0:.1f}s); serializing",
          file=sys.stderr, flush=True)
    blob = compiled.runtime_executable().serialize()
    print(f"AOT compile+serialize: {time.perf_counter()-t0:.1f}s, "
          f"{len(blob)/1e6:.2f} MB, backend={jax.default_backend()}")

    rng = np.random.default_rng(0)
    x = rng.normal(size=shape).astype(np.float32)
    # device_get can hand back an F-contiguous view (dlpack zero-copy);
    # the native runner's .npy reader requires C-order.
    logits = np.ascontiguousarray(jax.device_get(compiled(jnp.asarray(x))))

    # Row-independence probe (ADVICE r3): the native host's continuous
    # batching may only coalesce/zero-pad requests when output row r
    # depends on input row r ALONE.  A shape heuristic cannot see batch
    # coupling (e.g. error_control='global', where the adaptive step
    # sequence is a whole-batch reduction), so measure it: rerun the
    # compiled fn with the OTHER rows replaced by noise and require the
    # probed rows' outputs bitwise-identical.  Conservative on any
    # mismatch (rowwise=False -> the host serves full tensors only).
    rowwise = False
    if (len(shape) >= 1 and logits.ndim >= 1 and shape[0] == logits.shape[0]
            and shape[0] >= 2):
        rowwise = True
        for probe_seed in (1, 2):
            prng = np.random.default_rng(probe_seed)
            keep = prng.random(shape[0]) < 0.5
            if not keep.any() or keep.all():
                keep[0] = True
                keep[-1] = False
            x2 = prng.normal(size=shape).astype(np.float32)
            x2[keep] = x[keep]
            y2 = np.ascontiguousarray(jax.device_get(compiled(jnp.asarray(x2))))
            if not np.array_equal(y2[keep], logits[keep]):
                rowwise = False
                break
    print(f"rowwise probe: {'independent' if rowwise else 'COUPLED'} "
          f"(continuous batching {'enabled' if rowwise else 'disabled'})",
          file=sys.stderr, flush=True)

    suffix = f"_c{args.chain}" if args.chain > 1 else ""
    out = Path(args.out
               or (Path(args.run) / f"native_b{args.batch}{suffix}.npexec"))
    out.mkdir(parents=True, exist_ok=True)
    (out / "executable.bin").write_bytes(blob)
    np.save(out / "sample_input.npy", np.ascontiguousarray(x))
    np.save(out / "expected_logits.npy", logits)
    dev = jax.devices()[0]
    meta = {
        "format": "pjrt-serialized-executable",
        "platform": jax.default_backend(),
        "platform_version": getattr(dev.client, "platform_version", ""),
        "jax_version": jax.__version__,
        "inputs": [{"shape": list(shape), "dtype": "float32"}],
        "chain": args.chain,
        "outputs": [{"shape": list(logits.shape), "dtype": "float32"}],
        "model": model,
        "rowwise": rowwise,
        "sha256": hashlib.sha256(blob).hexdigest(),
        "bytes": len(blob),
        "config": {k: v for k, v in vars(cfg).items()
                   if not k.startswith("_")},
    }
    (out / "meta.json").write_text(json.dumps(meta, indent=2))
    print(f"native artifact: {out}")
    print(json.dumps({"artifact": str(out), "bytes": len(blob),
                      "sha256": meta["sha256"]}))


def mock_expected(x, out_shape, scale, shift, mode="flat"):
    """Replicate the mock plugin's compute (native/mock_pjrt_plugin.cc).

    ``mode="flat"``: ``out[j] = scale * in.ravel()[j % in.size] + shift``.
    ``mode="rowwise"``: ``out[r, c] = scale * in[r % R, c % irow] + shift``
    — output row r reads only input row r (grouping-invariant, the
    property the serving host's coalescing tests need).
    """
    import numpy as np

    x = np.asarray(x, np.float32)
    n_out = int(np.prod(out_shape))
    if mode == "rowwise":
        in_rows, out_rows = x.shape[0], out_shape[0]
        irow = x.size // in_rows
        orow = n_out // out_rows
        xr = x.reshape(in_rows, irow)
        r = np.arange(out_rows)[:, None] % in_rows
        c = np.arange(orow)[None, :] % irow
        y = scale * xr[r, c] + shift
    else:
        flat = x.ravel()
        y = scale * flat[np.arange(n_out) % flat.size] + shift
    return y.astype(np.float32).reshape(out_shape)


def write_mock_artifact(out_dir, in_shape=(4, 3, 5), out_shape=(4, 10),
                        scale=2.0, shift=1.0, layout="reversed", seed=0,
                        mode="flat"):
    """Fabricate a ``.npexec`` artifact for ``native/mock_pjrt_plugin.so``.

    The mock plugin (native/mock_pjrt_plugin.cc) computes
    :func:`mock_expected` (``mode="flat"`` by default; ``"rowwise"`` for a
    per-sample-aligned function) and, with ``layout="reversed"``, hands
    the output back in Fortran-order bytes — exercising the serving
    host's device-layout un-permute path without a TPU.  The artifact
    layout is identical to ``export-compiled``'s, so every pjrt_serve
    mode (--selftest/--bench/--serve/--listen) runs against it unchanged.
    """
    import numpy as np

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    desc = (
        "MOCKEXEC1\n"
        f"out_shape={','.join(str(d) for d in out_shape)}\n"
        f"scale={scale}\n"
        f"shift={shift}\n"
        f"layout={layout}\n"
    )
    if mode != "flat":
        desc += f"mode={mode}\n"
    (out / "executable.bin").write_text(desc)
    rng = np.random.default_rng(seed)
    x = rng.normal(size=in_shape).astype(np.float32)
    y = mock_expected(x, out_shape, scale, shift, mode)
    np.save(out / "sample_input.npy", np.ascontiguousarray(x))
    np.save(out / "expected_logits.npy", y)
    meta = {
        "format": "mock-pjrt-descriptor",
        "platform": "mock",
        "inputs": [{"shape": list(in_shape), "dtype": "float32"}],
        "outputs": [{"shape": list(out_shape), "dtype": "float32"}],
        "chain": 1,
        "scale": scale,
        "shift": shift,
        "layout": layout,
        "mode": mode,
        # Row-independence flag (ADVICE r3): only the rowwise mock compute
        # with ALIGNED leading dims has out-row-r = f(in-row-r); the serving
        # host gates its continuous-batching advertisement on this, never on
        # shape alone.
        "rowwise": bool(mode == "rowwise" and len(in_shape) >= 1
                        and len(out_shape) >= 1
                        and in_shape[0] == out_shape[0]),
    }
    (out / "meta.json").write_text(json.dumps(meta, indent=2))
    return out


def do_export_mock(args):
    out = write_mock_artifact(
        args.out, in_shape=tuple(int(d) for d in args.in_shape.split(",")),
        out_shape=tuple(int(d) for d in args.out_shape.split(",")),
        scale=args.scale, shift=args.shift, layout=args.layout)
    print(f"mock artifact: {out}")


def do_run(args):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import export as jexport

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    blob = Path(args.artifact).read_bytes()
    meta = json.loads(Path(args.artifact + ".json").read_text())
    exported = jexport.deserialize(blob)
    shape = tuple(meta["input_shape"])
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))

    call = jax.jit(exported.call)
    logits = jax.device_get(call(x))  # compile + run
    t0 = time.perf_counter()
    for _ in range(args.reps):
        logits = jax.device_get(call(x))
    dt = (time.perf_counter() - t0) / args.reps
    print(f"artifact runs: out shape {logits.shape}, "
          f"{shape[0]/dt:,.0f} img/s ({dt*1e3:.1f} ms/batch, "
          f"backend={jax.default_backend()})")

    if args.run:  # parity vs the live model
        params, cfg, extra = _load(Path(args.run), args.ckpt)
        fn = _logits_fn(params, cfg, extra.get("model", "odenet"))
        ref = jax.device_get(jax.jit(fn)(x))
        diff = float(np.abs(ref - logits).max())
        agree = float((ref.argmax(-1) == logits.argmax(-1)).mean())
        print(f"parity vs live model: max|diff|={diff:.2e}, "
              f"argmax agreement={agree:.4f}")
        assert agree == 1.0, "exported artifact diverges from the live model"


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="mode", required=True)
    pe = sub.add_parser("export")
    pe.add_argument("--run", required=True, help="run dir with checkpoints")
    pe.add_argument("--ckpt", default="ckpt_best.msgpack")
    pe.add_argument("--batch", type=int, default=256)
    pe.add_argument("--out", default=None)
    pe.add_argument("--cpu", action="store_true")
    pe.set_defaults(fn=do_export)
    pc = sub.add_parser("export-compiled",
                        help="AOT compile + serialize for native/pjrt_serve")
    pc.add_argument("--run", required=True, help="run dir with checkpoints")
    pc.add_argument("--ckpt", default="ckpt_best.msgpack")
    pc.add_argument("--batch", type=int, default=256)
    pc.add_argument("--chain", type=int, default=1,
                    help="batches per dispatch via lax.scan (throughput "
                         "serving: amortises per-request relay latency)")
    pc.add_argument("--out", default=None)
    pc.add_argument("--cpu", action="store_true",
                    help="pin to CPU (artifact then serves only on CPU)")
    pc.set_defaults(fn=do_export_compiled)
    pm = sub.add_parser("export-mock",
                        help="fabricate a .npexec for the mock PJRT plugin "
                             "(hermetic native-host testing, no TPU)")
    pm.add_argument("--out", required=True)
    pm.add_argument("--in-shape", default="4,3,5")
    pm.add_argument("--out-shape", default="4,10")
    pm.add_argument("--scale", type=float, default=2.0)
    pm.add_argument("--shift", type=float, default=1.0)
    pm.add_argument("--layout", default="reversed",
                    choices=["reversed", "rowmajor"])
    pm.set_defaults(fn=do_export_mock, cpu=True)
    pr = sub.add_parser("run")
    pr.add_argument("--artifact", required=True)
    pr.add_argument("--run", default=None,
                    help="optional run dir for a live-model parity check")
    pr.add_argument("--ckpt", default="ckpt_best.msgpack")
    pr.add_argument("--reps", type=int, default=3)
    pr.add_argument("--cpu", action="store_true")
    pr.set_defaults(fn=do_run)
    args = p.parse_args(argv)
    import jax

    # Persistent compile cache: axon first-compile can cost minutes per
    # process; the cache is verified to work cross-process (CLAUDE.md).
    # Must be set before the first compilation.  The helper skips
    # CPU-pinned processes (--cpu, or an embedding process that pinned via
    # jax.config, e.g. the test suite) and owns the mandatory entry gates
    # (XLA:CPU AOT entries are machine-feature-specific — see
    # utils/compile_cache.py).
    from neural_ode_features_tpu.utils import enable_tpu_compile_cache

    enable_tpu_compile_cache(cpu=getattr(args, "cpu", False))
    args.fn(args)


if __name__ == "__main__":
    main()
