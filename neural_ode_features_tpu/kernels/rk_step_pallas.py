"""Fused dopri5 RK-*step* Pallas kernel: one whole step attempt per launch.

BASELINE.json's north star asks for RK stages as XLA-resident blocks; round
2 shipped the per-ODEfunc kernel and measured the remaining ~2x in the RK
stage *linear algebra* — ~70 (B, N)-buffer HBM traversals per loop
iteration (RESULTS.md "Decomposition"): stage sums over seven k's, the
embedded-error sum, the dense-fit midpoint, plus every k written to HBM by
one XLA conv fusion and re-read by up to six later ones.  This kernel keeps
ALL of it VMEM-resident: one launch takes ``(t, dt, y0, f0=k1)`` for a
batch tile and produces ``(y1, f1=k7, y_mid, error_ratio)`` — six dynamics
evaluations (FSAL), six stage accumulations, the 5th/4th-order combination,
and the per-sample mixed-tolerance error norm, with the k's never leaving
VMEM.

The dynamics inside uses the same *split* ConcatConv lowering as the XLA
path (ops/layers.py:161): the time channel's contribution is ``t * M`` with
``M = conv(ones_map, W[:, :, :1, :])`` precomputed outside the solve loop,
so the in-kernel contraction is a clean C→C 3x3 conv — expressed as either
nine per-tap ``(TB·H·W, C) @ (C, C)`` MXU dots or one im2col
``(TB·H·W, 9C) @ (9C, C)`` dot (``conv_strategy``; probes/conv_probe.py
races them on hardware — round 2's per-tap variant measured latency-bound).

Solver integration: :func:`make_fused_dopri5_step` returns a
``fused_step(t0, dt, y0_flat, f0_flat)`` callable that
``solver.runge_kutta.adaptive_odeint`` invokes in place of
``_rk_attempt`` + ``_error_ratio`` (flag: ``ModelConfig.use_fused_rk``).
Equivalence vs the jnp path is asserted by tests/test_fused_rk.py
(interpreter mode on CPU; TPU spot-check in the bench harness).

reference: torchdiffeq/_impl/dopri5.py + misc.py — UNVERIFIED (the fused
step reproduces their embedded dopri5 semantics; the fusion itself has no
reference counterpart).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .odefunc_pallas import _group_assign, _group_norm_in_kernel

__all__ = ["make_fused_dopri5_step", "fused_rk_supported"]


# ---------------------------------------------------------------------------
# Rows layout ("roll*" conv strategies): the state lives as (TB·H·W, C) 2D
# rows (row-major b, y, x) and NEVER becomes 4D inside the kernel.  Round-3
# hardware probing (probes/conv_probe_r3.log) showed the 4D path's per-patch
# (TB, H, W, C) → (TB·H·W, C) reshapes are Mosaic *relayouts* — W=7 rows
# repacked across the 8-sublane boundary on every tap, 366 us/conv vs XLA's
# 5 us.  In rows layout a conv tap is a sublane roll of the whole row block
# plus an iota border mask (no relayout); GroupNorm's per-sample reductions
# become matmuls with an iota-built (TB, m) segment matrix, exactly like the
# channel→group assignment matmuls of odefunc_pallas._group_norm_in_kernel.
# ---------------------------------------------------------------------------


def _seg_matrix(tb: int, rows_per: int, transpose: bool = False):
    """0/1 sample-segment matrix built in-kernel from iota: seg[s, r] = 1
    iff row r belongs to sample s (rows are row-major (b, y, x), so sample
    boundaries fall every ``rows_per`` rows)."""
    m = tb * rows_per
    shape = (m, tb) if transpose else (tb, m)
    row_axis, samp_axis = (0, 1) if transpose else (1, 0)
    row = jax.lax.broadcasted_iota(jnp.int32, shape, row_axis) // rows_per
    samp = jax.lax.broadcasted_iota(jnp.int32, shape, samp_axis)
    return (row == samp).astype(jnp.float32)


def _group_norm_rows(h, scale, bias, groups, seg, segT, rows_per, eps=1e-5):
    """GroupNorm on (m, C) rows, fp32.  Per-sample sums ride the MXU via the
    segment matrix; channel→group sums via the assignment matrix; stats are
    broadcast back to rows with the transposed segment matmul."""
    m, c = h.shape
    gsize = c // groups
    n = rows_per * gsize
    assign = _group_assign(c, groups)  # (C, G)

    s_c = jnp.dot(seg, h, preferred_element_type=jnp.float32,
                    precision=lax.Precision.HIGHEST)  # (TB, C)
    s_g = jnp.dot(s_c, assign, preferred_element_type=jnp.float32,
                    precision=lax.Precision.HIGHEST)
    mean_g = s_g / n
    mean_c = jnp.dot(mean_g, assign.T, preferred_element_type=jnp.float32,
                    precision=lax.Precision.HIGHEST)
    mean_rows = jnp.dot(segT, mean_c, preferred_element_type=jnp.float32,
                    precision=lax.Precision.HIGHEST)
    d = h - mean_rows
    s2_c = jnp.dot(seg, d * d, preferred_element_type=jnp.float32,
                    precision=lax.Precision.HIGHEST)
    var_g = jnp.dot(s2_c, assign, preferred_element_type=jnp.float32,
                    precision=lax.Precision.HIGHEST) / n
    inv_g = jax.lax.rsqrt(var_g + eps)  # (TB, G)
    inv_c = jnp.dot(inv_g, assign.T, preferred_element_type=jnp.float32,
                    precision=lax.Precision.HIGHEST)
    inv_rows = jnp.dot(segT, inv_c, preferred_element_type=jnp.float32,
                    precision=lax.Precision.HIGHEST)
    return d * inv_rows * scale + bias


def _conv3x3_rows(h, w2_ref, hw, strategy: str, mxu_dtype, patch_ref):
    """3x3 SAME conv of (m, C) rows on the MXU: each tap is a sublane roll
    + iota border mask.  ``w2_ref``: (9C, C) with taps stacked (ky, kx)
    row-major.  ``patch_ref``: (m, 9C) VMEM scratch (rollS strategy only) —
    a single allocation genuinely REUSED across all convs in the kernel,
    unlike Mosaic's no-reuse value stack."""
    hh, ww = hw
    m, c = h.shape
    r = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
    y_pos = (r // ww) % hh
    x_pos = r % ww
    w_c = w2_ref[:].astype(mxu_dtype)
    prec = lax.Precision.HIGHEST if mxu_dtype == jnp.float32 else None

    def tap(ky, kx):
        off = (ky - 1) * ww + (kx - 1)
        shifted = pltpu.roll(h, (-off) % m, 0) if off else h
        ys = y_pos + (ky - 1)
        xs = x_pos + (kx - 1)
        mask = (ys >= 0) & (ys < hh) & (xs >= 0) & (xs < ww)
        return jnp.where(mask, shifted, 0.0)

    if strategy == "roll9":
        prods = [
            jnp.dot(tap(ky, kx).astype(mxu_dtype),
                    w_c[(ky * 3 + kx) * c:(ky * 3 + kx + 1) * c],
                    preferred_element_type=jnp.float32, precision=prec)
            for ky in range(3) for kx in range(3)
        ]
        while len(prods) > 1:
            prods = [a + b for a, b in zip(prods[::2], prods[1::2])] + (
                [prods[-1]] if len(prods) % 2 else [])
        return prods[0]
    if strategy == "rollS":
        for ky in range(3):
            for kx in range(3):
                k = ky * 3 + kx
                patch_ref[:, k * c:(k + 1) * c] = tap(ky, kx).astype(mxu_dtype)
        return jnp.dot(patch_ref[:], w_c, preferred_element_type=jnp.float32,
                       precision=prec)
    raise ValueError(f"unknown rows conv strategy {strategy!r}")


def _odefunc_rows(h, t_rows, refs, groups: int, hw, strategy: str,
                  mxu_dtype, seg, segT, patch_ref):
    """GN→ReLU→[conv + t·M + b]→GN→ReLU→[conv + t·M + b]→GN on (m, C) rows.

    ``refs`` = (n1s, n1b, w1, b1, m1, n2s, n2b, w2, b2, m2, n3s, n3b) with
    norm scales/biases (1, C), conv weights (9C, C), biases (1, C), and
    m1/m2 the border-aware time maps PRE-TILED to (m, C) rows."""
    (n1s, n1b, w1, b1, m1, n2s, n2b, w2, b2, m2, n3s, n3b) = refs
    rows_per = hw[0] * hw[1]

    out = _group_norm_rows(h, n1s[:], n1b[:], groups, seg, segT, rows_per)
    out = jnp.maximum(out, 0.0)
    out = (_conv3x3_rows(out, w1, hw, strategy, mxu_dtype, patch_ref)
           + t_rows * m1[:] + b1[:])
    out = _group_norm_rows(out, n2s[:], n2b[:], groups, seg, segT, rows_per)
    out = jnp.maximum(out, 0.0)
    out = (_conv3x3_rows(out, w2, hw, strategy, mxu_dtype, patch_ref)
           + t_rows * m2[:] + b2[:])
    return _group_norm_rows(out, n3s[:], n3b[:], groups, seg, segT, rows_per)


def _rk_step_kernel_rows(
    t_ref, dt_ref, y0_ref, f0_ref,
    n1s, n1b, w1, b1, m1, n2s, n2b, w2, b2, m2, n3s, n3b,
    y1_ref, f1_ref, ymid_ref, ratio_ref,
    *scratch,
    groups: int, strategy: str, rtol: float, atol: float, tab: dict,
    mxu_dtype, hw,
):
    patch_ref = scratch[0] if scratch else None
    hh, ww = hw
    rows_per = hh * ww
    m = y0_ref.shape[0]
    tb = m // rows_per

    t_rows = t_ref[:].astype(jnp.float32)   # (m, 1) — pre-repeated per row
    dt_rows = dt_ref[:].astype(jnp.float32)  # (m, 1)
    y0 = y0_ref[:].astype(jnp.float32)       # (m, C)
    seg = _seg_matrix(tb, rows_per)
    segT = _seg_matrix(tb, rows_per, transpose=True)
    refs = (n1s, n1b, w1, b1, m1, n2s, n2b, w2, b2, m2, n3s, n3b)

    a, b, b_err, c_nodes, c_mid = (tab[k] for k in
                                   ("a", "b", "b_err", "c", "c_mid"))
    stages = len(b)

    ks = [f0_ref[:].astype(jnp.float32)]
    for i in range(1, stages):
        acc = None
        for j in range(i):
            if a[i][j] == 0.0:
                continue
            term = a[i][j] * ks[j]
            acc = term if acc is None else acc + term
        yi = y0 if acc is None else y0 + dt_rows * acc
        ti = t_rows + c_nodes[i] * dt_rows
        ks.append(_odefunc_rows(yi, ti, refs, groups, hw, strategy,
                                mxu_dtype, seg, segT, patch_ref))

    def combo(coeffs):
        acc = None
        for j in range(stages):
            if coeffs[j] == 0.0:
                continue
            term = coeffs[j] * ks[j]
            acc = term if acc is None else acc + term
        return acc

    y1 = y0 + dt_rows * combo(b)
    err = dt_rows * combo(b_err)
    y_mid = y0 + dt_rows * combo(c_mid)

    # Per-sample mixed-tolerance RMS: segment-matmul the squared scaled
    # error down to (TB, C), then a ones-matmul over channels.
    scale = atol + rtol * jnp.maximum(jnp.abs(y0), jnp.abs(y1))
    r2 = jnp.square(err / scale)
    s_c = jnp.dot(seg, r2, preferred_element_type=jnp.float32,
                    precision=lax.Precision.HIGHEST)  # (TB, C)
    c = y0.shape[1]
    ones_col = jnp.ones((c, 1), jnp.float32)
    mean_r2 = jnp.dot(s_c, ones_col, preferred_element_type=jnp.float32,
                      precision=lax.Precision.HIGHEST) / (rows_per * c)
    ratio = jnp.sqrt(mean_r2 + jnp.finfo(jnp.float32).tiny)  # (TB, 1)

    y1_ref[:] = y1.astype(y1_ref.dtype)
    f1_ref[:] = ks[-1].astype(f1_ref.dtype)
    ymid_ref[:] = y_mid.astype(ymid_ref.dtype)
    ratio_ref[:] = ratio.astype(ratio_ref.dtype)


def _conv3x3_in_kernel(h, w_ref, strategy: str, mxu_dtype):
    """3x3 SAME conv of an fp32 (TB, H, W, C) value with a (3, 3, C, C)
    weight ref, on the MXU.  No time channel — the split lowering adds
    ``t * M`` outside the contraction.

    ``mxu_dtype=jnp.bfloat16`` reproduces XLA's DEFAULT conv precision on
    TPU (bf16 multiplies, fp32 accumulation — the production jnp path's
    own numerics there; the MXU's native rate).  ``jnp.float32`` matches
    the strict-f32 CPU reference (interpreter tests)."""
    tb, hh, ww, c = h.shape
    m = tb * hh * ww
    hp = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)))
    cast = lambda z: z.astype(mxu_dtype)
    prec = lax.Precision.HIGHEST if mxu_dtype == jnp.float32 else None

    if strategy == "im2col":
        pieces = [
            hp[:, ky:ky + hh, kx:kx + ww, :].reshape(m, c)
            for ky in range(3) for kx in range(3)
        ]
        patches = jnp.concatenate(pieces, axis=1)  # (m, 9C)
        out = jnp.dot(cast(patches), cast(w_ref[:].reshape(9 * c, c)),
                      preferred_element_type=jnp.float32, precision=prec)
    elif strategy == "tree9":
        prods = []
        for ky in range(3):
            for kx in range(3):
                patch = hp[:, ky:ky + hh, kx:kx + ww, :].reshape(m, c)
                prods.append(jnp.dot(cast(patch), cast(w_ref[ky, kx]),
                                     preferred_element_type=jnp.float32,
                                     precision=prec))
        while len(prods) > 1:
            paired = [a + b for a, b in zip(prods[::2], prods[1::2])]
            if len(prods) % 2:
                paired.append(prods[-1])
            prods = paired
        out = prods[0]
    elif strategy == "fori9":
        w9 = w_ref[:].reshape(9, c, c)

        def body(k, acc):
            ky, kx = k // 3, k % 3
            patch = lax.dynamic_slice(
                hp, (0, ky, kx, 0), (tb, hh, ww, c)).reshape(m, c)
            return acc + jnp.dot(
                cast(patch),
                cast(lax.dynamic_index_in_dim(w9, k, keepdims=False)),
                preferred_element_type=jnp.float32, precision=prec)

        out = lax.fori_loop(0, 9, body, jnp.zeros((m, c), jnp.float32))
    else:
        raise ValueError(f"unknown conv strategy {strategy!r}")
    return out.reshape(tb, hh, ww, c)


def _odefunc_in_kernel(h, t_col, refs, groups: int, strategy: str,
                       mxu_dtype):
    """GN→ReLU→[conv + t·M + b]→GN→ReLU→[conv + t·M + b]→GN, fp32.

    ``refs`` = (n1s, n1b, w1, b1, m1, n2s, n2b, w2, b2, m2, n3s, n3b)
    where m1/m2 are the precomputed border-aware time maps (H, W, C)."""
    (n1s, n1b, w1, b1, m1, n2s, n2b, w2, b2, m2, n3s, n3b) = refs
    t4 = t_col[:, :, None, None]  # (TB, 1, 1, 1)

    out = _group_norm_in_kernel(h, n1s[:], n1b[:], groups)
    out = jnp.maximum(out, 0.0)
    out = (_conv3x3_in_kernel(out, w1, strategy, mxu_dtype)
           + t4 * m1[:] + b1[:])
    out = _group_norm_in_kernel(out, n2s[:], n2b[:], groups)
    out = jnp.maximum(out, 0.0)
    out = (_conv3x3_in_kernel(out, w2, strategy, mxu_dtype)
           + t4 * m2[:] + b2[:])
    return _group_norm_in_kernel(out, n3s[:], n3b[:], groups)


def _rk_step_kernel(
    t_ref, dt_ref, y0_ref, f0_ref,
    n1s, n1b, w1, b1, m1, n2s, n2b, w2, b2, m2, n3s, n3b,
    y1_ref, f1_ref, ymid_ref, ratio_ref,
    *, groups: int, strategy: str, rtol: float, atol: float, tab: dict,
    mxu_dtype=jnp.float32,
):
    t0 = t_ref[:].astype(jnp.float32)   # (TB, 1)
    dt = dt_ref[:].astype(jnp.float32)  # (TB, 1)
    dt4 = dt[:, :, None, None]          # (TB, 1, 1, 1)
    y0 = y0_ref[:].astype(jnp.float32)  # (TB, H, W, C)
    refs = (n1s, n1b, w1, b1, m1, n2s, n2b, w2, b2, m2, n3s, n3b)

    a, b, b_err, c_nodes, c_mid = (tab[k] for k in
                                   ("a", "b", "b_err", "c", "c_mid"))
    stages = len(b)

    ks = [f0_ref[:].astype(jnp.float32)]
    for i in range(1, stages):
        acc = None
        for j in range(i):
            if a[i][j] == 0.0:
                continue
            term = a[i][j] * ks[j]
            acc = term if acc is None else acc + term
        yi = y0 if acc is None else y0 + dt4 * acc
        ti = t0 + c_nodes[i] * dt
        ks.append(_odefunc_in_kernel(yi, ti, refs, groups, strategy,
                                     mxu_dtype))

    def combo(coeffs):
        acc = None
        for j in range(stages):
            if coeffs[j] == 0.0:
                continue
            term = coeffs[j] * ks[j]
            acc = term if acc is None else acc + term
        return acc

    y1 = y0 + dt4 * combo(b)
    err = dt4 * combo(b_err)
    y_mid = y0 + dt4 * combo(c_mid)

    # Per-sample mixed-tolerance RMS error ratio, entirely in VMEM.
    # atol > 0 in every production config ⇒ scale > 0, no 0/0 guard needed
    # (the wrapper refuses atol == 0).  The trailing (C → 1) reduction is a
    # ones-matmul: Mosaic requires reductions to keep a trailing axis.
    scale = atol + rtol * jnp.maximum(jnp.abs(y0), jnp.abs(y1))
    r2 = jnp.square(err / scale)
    tbatch, hh, ww, c = y0.shape
    s_c = jnp.sum(r2, axis=(1, 2))  # (TB, C)
    ones_col = jnp.ones((c, 1), jnp.float32)
    n = hh * ww * c
    mean_r2 = jnp.dot(s_c, ones_col, preferred_element_type=jnp.float32,
                      precision=lax.Precision.HIGHEST) / n  # (TB, 1)
    ratio = jnp.sqrt(mean_r2 + jnp.finfo(jnp.float32).tiny)

    y1_ref[:] = y1.astype(y1_ref.dtype)
    f1_ref[:] = ks[-1].astype(f1_ref.dtype)
    ymid_ref[:] = y_mid.astype(ymid_ref.dtype)
    ratio_ref[:] = ratio.astype(ratio_ref.dtype)


def _pick_tile(b: int, hh: int, ww: int, c: int, budget_mb: float = 8.0) -> int:
    """Largest batch tile ≤ 64 dividing B whose ~12-buffer fp32 working set
    (8 stage states + conv scratch incl. the im2col patch matrix) fits the
    VMEM budget."""
    tb = min(64, b)
    while b % tb:
        tb -= 1
    per_tb = (11 * hh * ww * c + (hh + 2) * (ww + 2) * c
              + hh * ww * 9 * c) * 4  # bytes per batch row
    budget = budget_mb * 1024 * 1024
    while tb > 1 and tb * per_tb > budget:
        tb = max(1, tb // 2)
        while b % tb:
            tb -= 1
    return tb


def fused_rk_supported(batch: int, n: int, hw: tuple[int, int],
                       groups: int) -> bool:
    hh, ww = hw
    if n % (hh * ww):
        return False
    c = n // (hh * ww)
    if c % groups or c > 256:
        return False
    return _pick_tile(batch, hh, ww, c) >= 8


def _tableau_dict(tableau) -> dict:
    """Bake the tableau into plain Python floats (compile-time constants)."""
    return {
        "a": [[float(v) for v in row] for row in np.asarray(tableau.a)],
        "b": [float(v) for v in tableau.b],
        "b_err": [float(v) for v in tableau.b_err],
        "c": [float(v) for v in tableau.c],
        "c_mid": [float(v) for v in tableau.c_mid],
    }


def _ones_time_map(w, hh: int, ww: int):
    """Border-aware time map M = conv(ones (1,H,W,1), W[:,:,:1,:]) — the
    split ConcatConv lowering's t-channel contribution (ops/layers.py:161),
    computed once per solve outside the loop."""
    ones = jnp.ones((1, hh, ww, 1), jnp.float32)
    # Strict f32: on TPU the DEFAULT conv precision is bf16 multiplies,
    # which would round every weight in the map — this conv runs once per
    # solve, and the backward kernel's gradient parity depends on it.
    m = lax.conv_general_dilated(
        ones, w[:, :, :1, :].astype(jnp.float32), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST,
    )
    return m[0]  # (H, W, C)


def make_fused_dopri5_step(
    params, tableau, hw: tuple[int, int], *,
    groups: int = 32,
    rtol: float,
    atol: float,
    conv_strategy: str = "rollS",
    conv_precision: str | None = None,
    interpret: bool | None = None,
    tile: int | None = None,
):
    """Build the ``fused_step`` callable for ``adaptive_odeint``.

    ``params``: the ODEfunc param dict (norm1/conv1/norm2/conv2/norm3 with
    ConcatConv kernels of shape (3, 3, C+1, C)).  ``hw``: the spatial shape
    the flat state folds to.  Returns
    ``fused_step(t0 (B,), dt (B,), y0 (B,N), f0 (B,N))
    -> (y1, f1, y_mid, ratio)``.

    ``conv_precision``: ``'bf16'`` = bf16 multiplies / fp32 accumulation
    (XLA's DEFAULT conv precision on TPU — the production jnp path's own
    numerics there, and the MXU's native rate) | ``'f32'`` (strict, ~3x
    slower MXU passes) | None = auto: bf16 on hardware, f32 in the
    interpreter (each matching the jnp path on the SAME backend).
    """
    if atol <= 0.0:
        raise ValueError("fused RK step requires atol > 0 (in-kernel error "
                         "norm has no 0/0 guard)")
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if conv_precision is None:
        conv_precision = "f32" if interpret else "bf16"
    mxu_dtype = jnp.bfloat16 if conv_precision == "bf16" else jnp.float32
    hh, ww = hw
    tab = _tableau_dict(tableau)

    w1_full = params["conv1"]["kernel"].astype(jnp.float32)
    w2_full = params["conv2"]["kernel"].astype(jnp.float32)
    w1, w2 = w1_full[:, :, 1:, :], w2_full[:, :, 1:, :]
    m1 = _ones_time_map(w1_full, hh, ww)
    m2 = _ones_time_map(w2_full, hh, ww)
    n1s, n1b = params["norm1"]["scale"], params["norm1"]["bias"]
    n2s, n2b = params["norm2"]["scale"], params["norm2"]["bias"]
    n3s, n3b = params["norm3"]["scale"], params["norm3"]["bias"]
    b1, b2 = params["conv1"]["bias"], params["conv2"]["bias"]

    if conv_strategy.startswith("roll"):
        return _make_rows_step(
            w1, w2, m1, m2, n1s, n1b, n2s, n2b, n3s, n3b, b1, b2,
            hw=hw, groups=groups, rtol=rtol, atol=atol,
            conv_strategy=conv_strategy, mxu_dtype=mxu_dtype,
            interpret=interpret, tile=tile, tab=tab,
        )

    def fused_step(t0, dt, y0_flat, f0_flat):
        batch, n = y0_flat.shape
        c = n // (hh * ww)
        tb = tile or _pick_tile(batch, hh, ww, c)
        grid = (batch // tb,)

        y0 = y0_flat.reshape(batch, hh, ww, c)
        f0 = f0_flat.reshape(batch, hh, ww, c)
        t_col = t0.astype(jnp.float32)[:, None]
        dt_col = dt.astype(jnp.float32)[:, None]

        def block():
            return pl.BlockSpec((tb, hh, ww, c), lambda g: (g, 0, 0, 0),
                                memory_space=pltpu.VMEM)

        col = lambda: pl.BlockSpec((tb, 1), lambda g: (g, 0),
                                   memory_space=pltpu.VMEM)
        full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)

        kern = functools.partial(
            _rk_step_kernel, groups=groups, strategy=conv_strategy,
            rtol=float(rtol), atol=float(atol), tab=tab,
            mxu_dtype=mxu_dtype,
        )
        y1, f1, y_mid, ratio = pl.pallas_call(
            kern,
            out_shape=(
                jax.ShapeDtypeStruct(y0.shape, y0_flat.dtype),
                jax.ShapeDtypeStruct(y0.shape, y0_flat.dtype),
                jax.ShapeDtypeStruct(y0.shape, y0_flat.dtype),
                jax.ShapeDtypeStruct((batch, 1), jnp.float32),
            ),
            grid=grid,
            in_specs=[col(), col(), block(), block()]
            + [full()] * 12,
            out_specs=(block(), block(), block(), col()),
            interpret=interpret,
        )(
            t_col, dt_col, y0, f0,
            n1s, n1b, w1, b1, m1,
            n2s, n2b, w2, b2, m2,
            n3s, n3b,
        )
        flat = lambda z: z.reshape(batch, n)
        return flat(y1), flat(f1), flat(y_mid), ratio[:, 0]

    return fused_step


def _make_rows_step(
    w1, w2, m1, m2, n1s, n1b, n2s, n2b, n3s, n3b, b1, b2, *,
    hw, groups, rtol, atol, conv_strategy, mxu_dtype, interpret, tile, tab,
):
    """Build the rows-layout fused step (see _rk_step_kernel_rows): operands
    pre-shaped so the kernel only ever sees 2D values."""
    hh, ww = hw
    rows_per = hh * ww
    c = w1.shape[-1]
    w1r = w1.reshape(9 * c, c)  # taps stacked (ky, kx) row-major
    w2r = w2.reshape(9 * c, c)
    m1r = m1.reshape(rows_per, c)
    m2r = m2.reshape(rows_per, c)
    row1 = lambda v: v.reshape(1, c)

    def fused_step(t0, dt, y0_flat, f0_flat):
        batch, n = y0_flat.shape
        # Rows layout holds 8 (m, C) stage states with lanes padded C→128;
        # tb=32 overflows the 16 MB scoped-VMEM stack by 20 KB (measured,
        # probes/rk_step_probe.log.err) — cap at 16, then shrink to a
        # divisor of batch (a bare min() would make grid = batch // tb
        # silently drop the tail samples).
        tb = tile or min(16, _pick_tile(batch, hh, ww, c))
        while batch % tb:
            tb -= 1
        m_block = tb * rows_per
        grid = (batch // tb,)

        y0 = y0_flat.reshape(batch * rows_per, c)
        f0 = f0_flat.reshape(batch * rows_per, c)
        t_rows = jnp.repeat(t0.astype(jnp.float32), rows_per)[:, None]
        dt_rows = jnp.repeat(dt.astype(jnp.float32), rows_per)[:, None]
        m1_t = jnp.tile(m1r, (tb, 1))
        m2_t = jnp.tile(m2r, (tb, 1))

        rows = lambda: pl.BlockSpec((m_block, c), lambda g: (g, 0),
                                    memory_space=pltpu.VMEM)
        col = lambda: pl.BlockSpec((m_block, 1), lambda g: (g, 0),
                                   memory_space=pltpu.VMEM)
        samp_col = lambda: pl.BlockSpec((tb, 1), lambda g: (g, 0),
                                        memory_space=pltpu.VMEM)
        full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)

        kern = functools.partial(
            _rk_step_kernel_rows, groups=groups, strategy=conv_strategy,
            rtol=float(rtol), atol=float(atol), tab=tab,
            mxu_dtype=mxu_dtype, hw=hw,
        )
        scratch = ([pltpu.VMEM((m_block, 9 * c), mxu_dtype)]
                   if conv_strategy == "rollS" else [])
        y1, f1, y_mid, ratio = pl.pallas_call(
            kern,
            out_shape=(
                jax.ShapeDtypeStruct(y0.shape, y0_flat.dtype),
                jax.ShapeDtypeStruct(y0.shape, y0_flat.dtype),
                jax.ShapeDtypeStruct(y0.shape, y0_flat.dtype),
                jax.ShapeDtypeStruct((batch, 1), jnp.float32),
            ),
            grid=grid,
            in_specs=[col(), col(), rows(), rows()] + [full()] * 12,
            out_specs=(rows(), rows(), rows(), samp_col()),
            scratch_shapes=scratch,
            interpret=interpret,
        )(
            t_rows, dt_rows, y0, f0,
            row1(n1s), row1(n1b), w1r, row1(b1), m1_t,
            row1(n2s), row1(n2b), w2r, row1(b2), m2_t,
            row1(n3s), row1(n3b),
        )
        flat = lambda z: z.reshape(batch, n)
        return flat(y1), flat(f1), flat(y_mid), ratio[:, 0]

    return fused_step
