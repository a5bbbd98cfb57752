#!/usr/bin/env python
"""Race in-kernel 3x3-conv strategies on the real TPU chip.

Round 2 measured the fused ODEfunc kernel's conv at 447 us vs XLA's 60 us
(B=256): 18 small sequential per-tap matmuls are latency-bound.  The fused
RK-step kernel (VERDICT r3 #2) only has a perf case if the in-kernel conv
gets to ~XLA speed, so this probe times isolated conv strategies, all using
the *split* ConcatConv lowering (ops/layers.py:161 — the time channel's
contribution t*M is a precomputed map added OUTSIDE the contraction, so the
in-kernel conv is a clean C->C matmul with no 65th channel):

  seq9    9 sequential accumulating (TB*HW, C)@(C, C) dots (r2 baseline)
  tree9   9 independent dots, tree-summed (lets Mosaic pipeline the MXU)
  fori9   fori_loop over taps, dynamic slices (small code, shared stack)
  im2col  one (TB*HW, 9C)@(9C, C) dot (lane-concat patches)

Timing: chained lax.scan of ITERS kernel calls inside ONE dispatch (0.6 s
tunnel dispatch overhead swamps per-call timing), best of REPS.  Results
append to probes/conv_probe_r3.log with compile wall-times.
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from neural_ode_features_tpu.utils import enable_tpu_compile_cache  # noqa: E402

enable_tpu_compile_cache()  # gated (see utils/compile_cache.py)

LOG = "/root/repo/probes/conv_probe_r3.log"
B, H, W, C = 256, 7, 7, 64
# The dispatch overhead through the tunnel is ~0.6 s with multi-second
# stalls; the chained work must dwarf it.  1000 convs ≈ 60 ms at XLA's
# 60 us/conv — still noisy, so the per-conv number uses the SLOPE between
# a long and a short chain ((t_long - t_short) / (ITERS - ITERS_SHORT)),
# which cancels the per-dispatch constant exactly.
ITERS = 1200
ITERS_SHORT = 200
REPS = 5


def log(msg):
    line = f"{time.strftime('%H:%M:%S')} {msg}"
    print(line, flush=True)
    with open(LOG, "a") as f:
        f.write(line + "\n")


def make_kernel(strategy: str, tb: int):
    # '<name>_bf16' = bf16 multiplies / fp32 accumulation — XLA's DEFAULT
    # conv precision on TPU and the MXU's native rate (f32 dots cost ~3x).
    if strategy.endswith("_bf16"):
        strategy = strategy[:-5]
        mxu = jnp.bfloat16
    else:
        mxu = jnp.float32

    def kernel(x_ref, w_ref, out_ref):
        h = x_ref[:].astype(jnp.float32)  # (TB, H, W, C)
        # Mosaic cannot reshape a 4D bf16 vector (infer-vector-layout:
        # unsupported shape cast, measured 12:18 r3) — keep the padded map
        # f32, reshape 4D->2D in f32, and cast the 2D patch to the MXU
        # dtype AFTER the collapse.
        hp = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)))
        w_c = w_ref[:].astype(mxu)
        m = tb * H * W

        def patch(ky, kx):
            return hp[:, ky:ky + H, kx:kx + W, :].reshape(m, C).astype(mxu)

        if strategy == "seq9":
            acc = jnp.zeros((m, C), jnp.float32)
            for ky in range(3):
                for kx in range(3):
                    acc = acc + jnp.dot(
                        patch(ky, kx), w_c[ky, kx],
                        preferred_element_type=jnp.float32)
            out = acc
        elif strategy == "tree9":
            prods = []
            for ky in range(3):
                for kx in range(3):
                    prods.append(jnp.dot(
                        patch(ky, kx), w_c[ky, kx],
                        preferred_element_type=jnp.float32))
            while len(prods) > 1:
                prods = [a + b for a, b in
                         zip(prods[::2], prods[1::2])] + (
                            [prods[-1]] if len(prods) % 2 else [])
            out = prods[0]
        elif strategy == "fori9":
            w9 = w_c.reshape(9, C, C)

            def body(k, acc):
                ky, kx = k // 3, k % 3
                patch = lax.dynamic_slice(
                    hp, (0, ky, kx, 0), (tb, H, W, C)).reshape(m, C)
                return acc + jnp.dot(
                    patch, lax.dynamic_index_in_dim(w9, k, keepdims=False),
                    preferred_element_type=jnp.float32)

            out = lax.fori_loop(0, 9, body, jnp.zeros((m, C), jnp.float32))
        elif strategy == "im2col":
            pieces = [patch(ky, kx) for ky in range(3) for kx in range(3)]
            patches = jnp.concatenate(pieces, axis=1)  # (m, 9C)
            out = jnp.dot(patches, w_c.reshape(9 * C, C),
                          preferred_element_type=jnp.float32)
        else:
            raise ValueError(strategy)
        out_ref[:] = out.reshape(tb, H, W, C)

    return kernel


def make_scratch_kernel(strategy: str, tb: int):
    """im2col with the patch matrix built in a VMEM *scratch* ref (one
    allocation, 9 stores) instead of a lane-concat value — the concat
    materializes per-tap on this Mosaic's no-slot-reuse stack allocator
    (round-2 diagnosis: 42-65 MB stack → HTTP 500/OOM)."""
    if strategy.endswith("_bf16"):
        mxu = jnp.bfloat16
    else:
        mxu = jnp.float32
    m = tb * H * W

    def kernel(x_ref, w_ref, out_ref, patch_ref):
        h = x_ref[:].astype(jnp.float32)
        # f32 pad + f32 4D->2D reshape, cast to MXU dtype on the 2D value
        # (Mosaic can't shape-cast 4D bf16 — see make_kernel).
        hp = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)))
        for ky in range(3):
            for kx in range(3):
                k = ky * 3 + kx
                patch_ref[:, k * C:(k + 1) * C] = (
                    hp[:, ky:ky + H, kx:kx + W, :].reshape(m, C).astype(mxu))
        out = jnp.dot(patch_ref[:], w_ref[:].astype(mxu).reshape(9 * C, C),
                      preferred_element_type=jnp.float32)
        out_ref[:] = out.reshape(tb, H, W, C)

    return kernel, [pltpu.VMEM((m, 9 * C), mxu)]


def make_roll_kernel(strategy: str, tb: int):
    """2D-native conv: state lives as (TB*H*W, C) rows (row-major b,y,x)
    and NEVER becomes 4D — each of the 9 taps is a sublane roll of the
    whole row block plus an iota border mask.  No 4D reshapes = no Mosaic
    relayouts (seq9's 366 us/conv at tb=32 is relayout-bound: W=7 rows
    repack across the 8-sublane boundary on every patch).

      roll9   9 rolled+masked (m, C) @ (C, C) dots, tree-summed
      rollS   rolls stored into a (m, 9C) VMEM scratch, ONE (m,9C)@(9C,C) dot

    Weights arrive pre-reshaped (9C, C) — 2D row slices only."""
    base = strategy[:-5] if strategy.endswith("_bf16") else strategy
    mxu = jnp.bfloat16 if strategy.endswith("_bf16") else jnp.float32
    m = tb * H * W

    def taps(h):
        """Yield (k, masked 2D patch f32) for the 9 taps."""
        r = lax.broadcasted_iota(jnp.int32, (m, 1), 0)
        y_pos = (r // W) % H
        x_pos = r % W
        for ky in range(3):
            for kx in range(3):
                k = ky * 3 + kx
                off = (ky - 1) * W + (kx - 1)
                shifted = pltpu.roll(h, (-off) % m, 0) if off else h
                ys = y_pos + (ky - 1)
                xs = x_pos + (kx - 1)
                mask = ((ys >= 0) & (ys < H) & (xs >= 0) & (xs < W))
                yield k, jnp.where(mask, shifted, 0.0)

    if base == "dotonly":
        # Lower bound: ONE (m, 9C)@(9C, C) dot on an unbuilt (tiled) patch —
        # prices the MXU work with zero patch-building (wrong numerics).
        def kernel(x_ref, w_ref, out_ref, patch_ref):
            h = x_ref[:].astype(mxu)
            for k in range(9):
                patch_ref[:, k * C:(k + 1) * C] = h
            out_ref[:] = jnp.dot(patch_ref[:], w_ref[:].astype(mxu),
                                 preferred_element_type=jnp.float32)

        return kernel, [pltpu.VMEM((m, 9 * C), mxu)]

    if base in ("norollS", "nomaskS"):
        # Diagnostics: rollS with the roll (resp. the mask) removed — wrong
        # numerics, isolates which patch-building op eats the time.
        def kernel(x_ref, w_ref, out_ref, patch_ref):
            h = x_ref[:].astype(jnp.float32)
            r = lax.broadcasted_iota(jnp.int32, (m, 1), 0)
            y_pos = (r // W) % H
            x_pos = r % W
            for ky in range(3):
                for kx in range(3):
                    k = ky * 3 + kx
                    off = (ky - 1) * W + (kx - 1)
                    if base == "norollS":
                        ys = y_pos + (ky - 1)
                        xs = x_pos + (kx - 1)
                        mask = ((ys >= 0) & (ys < H) & (xs >= 0) & (xs < W))
                        p = jnp.where(mask, h, 0.0)
                    else:
                        p = pltpu.roll(h, (-off) % m, 0) if off else h
                    patch_ref[:, k * C:(k + 1) * C] = p.astype(mxu)
            out_ref[:] = jnp.dot(patch_ref[:], w_ref[:].astype(mxu),
                                 preferred_element_type=jnp.float32)

        return kernel, [pltpu.VMEM((m, 9 * C), mxu)]

    if base == "roll9":
        def kernel(x_ref, w_ref, out_ref):
            h = x_ref[:].astype(jnp.float32)
            w2 = w_ref[:].astype(mxu)  # (9C, C)
            prods = [
                jnp.dot(p.astype(mxu), w2[k * C:(k + 1) * C],
                        preferred_element_type=jnp.float32)
                for k, p in taps(h)
            ]
            while len(prods) > 1:
                prods = [a + b for a, b in zip(prods[::2], prods[1::2])] + (
                    [prods[-1]] if len(prods) % 2 else [])
            out_ref[:] = prods[0]

        return kernel, []

    def kernel(x_ref, w_ref, out_ref, patch_ref):
        h = x_ref[:].astype(jnp.float32)
        for k, p in taps(h):
            patch_ref[:, k * C:(k + 1) * C] = p.astype(mxu)
        out_ref[:] = jnp.dot(patch_ref[:], w_ref[:].astype(mxu),
                             preferred_element_type=jnp.float32)

    return kernel, [pltpu.VMEM((m, 9 * C), mxu)]


def pallas_conv_2d(strategy: str, tb: int):
    kern, scratch = make_roll_kernel(strategy, tb)
    mrows = tb * H * W

    @jax.jit
    def run(x, w):
        x2 = x.reshape(B * H * W, C)
        w2 = w.reshape(9 * C, C)
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((B * H * W, C), jnp.float32),
            grid=(B // tb,),
            in_specs=[
                pl.BlockSpec((mrows, C), lambda g: (g, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((mrows, C), lambda g: (g, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=scratch,
        )(x2, w2)
        return out.reshape(B, H, W, C)

    return run


def pallas_conv(strategy: str, tb: int):
    if strategy.startswith(("roll", "dotonly", "norollS", "nomaskS")):
        return pallas_conv_2d(strategy, tb)
    if strategy.startswith("im2colS"):
        kern, scratch = make_scratch_kernel(strategy[len("im2colS"):], tb)
    else:
        kern, scratch = make_kernel(strategy, tb), []

    @jax.jit
    def run(x, w):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((B, H, W, C), jnp.float32),
            grid=(B // tb,),
            in_specs=[
                pl.BlockSpec((tb, H, W, C), lambda g: (g, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tb, H, W, C), lambda g: (g, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=scratch,
        )(x, w)

    return run


def xla_conv():
    @jax.jit
    def run(x, w):
        return lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )

    return run


def timed(fn, x, w, label):
    t0 = time.perf_counter()

    def make_loop(n):
        @jax.jit
        def loop(x, w):
            def body(h, _):
                return x + 1e-6 * fn(h, w), None

            out, _ = lax.scan(body, x, None, length=n)
            return jnp.mean(out)

        return loop

    loop_long = make_loop(ITERS)
    loop_short = make_loop(ITERS_SHORT)
    try:
        float(jax.device_get(loop_long(x, w)))
        float(jax.device_get(loop_short(x, w)))
    except Exception as e:
        log(f"{label}: FAILED compile/run: {str(e)[:600]}")
        with open(LOG + ".err", "a") as f:
            f.write(f"=== {time.strftime('%H:%M:%S')} {label} ===\n"
                    f"{type(e).__name__}: {e}\n\n")
        return None
    compile_s = time.perf_counter() - t0

    best_long = best_short = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        float(jax.device_get(loop_long(x, w)))
        best_long = min(best_long, time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(jax.device_get(loop_short(x, w)))
        best_short = min(best_short, time.perf_counter() - t0)
    us_per_conv = (best_long - best_short) / (ITERS - ITERS_SHORT) * 1e6
    log(f"{label}: {us_per_conv:8.1f} us/conv  "
        f"(long {best_long:.3f}s short {best_short:.3f}s "
        f"compile {compile_s:.0f}s)")
    return us_per_conv


def check_correct(fn, x, w, label):
    ref = np.asarray(jax.device_get(xla_conv()(x, w)))
    got = np.asarray(jax.device_get(jax.jit(fn)(x, w)))
    err = np.abs(ref - got).max()
    log(f"{label}: max|diff vs XLA| = {err:.2e}")
    return err


def main():
    log(f"=== conv probe: B={B} {H}x{W}x{C}, iters={ITERS}, "
        f"backend={jax.default_backend()} ===")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32) * 0.1)
    w = jnp.asarray(rng.normal(size=(3, 3, C, C)).astype(np.float32) * 0.05)

    todo = sys.argv[1:] or ["im2col:64", "tree9:64", "fori9:64", "seq9:64",
                            "im2col:128", "tree9:128"]
    if todo and todo[0] == "--no-xla":
        todo = todo[1:]
    else:
        timed(xla_conv(), x, w, "xla_conv (reference)")
    for spec in todo:
        strategy, tb_s = spec.split(":")
        tb = int(tb_s)
        fn = pallas_conv(strategy, tb)
        r = timed(fn, x, w, f"pallas {strategy} tb={tb}")
        if r is not None and r < 200:
            check_correct(fn, x, w, f"  {strategy} tb={tb}")


if __name__ == "__main__":
    main()
