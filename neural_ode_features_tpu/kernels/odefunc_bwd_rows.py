"""Rows-layout fused backward for the Pallas ODEfunc (the VJP pair's bwd).

Round 2's 4D backward kernel compiled but hit Mosaic's scoped-VMEM *stack*
OOM on hardware (57 MB vs the 16 MB limit): its two unrolled 9-tap conv
backwards each kept per-iteration padded (TB, H+2, W+2, C+1) patch values
live, and Mosaic's stack allocator does not reuse slots across unrolled
iterations (ARCHITECTURE.md, probes/).  Round-3 hardware probing of the
fused RK-step kernel found the cure for the *forward* convs — the rows
layout: keep the state as (TB·H·W, C) 2D rows, express a conv tap as a
sublane ``pltpu.roll`` + iota border mask (no 4D relayouts), and stage the
nine taps through ONE explicitly-reused VMEM scratch (m, 9C) patch matrix
(kernels/rk_step_pallas.py).  This module applies the same layout to the
backward pass:

  * forward recompute (flash-attention style — residuals are just
    ``(params, t, h)``) entirely in rows with the split ConcatConv lowering
    (spatial (9C, C) weights + precomputed border-aware time maps);
  * conv input-gradients as ONE (m, C) @ (C, 9C) MXU dot against the
    pre-transposed spatial weights, un-scattered with nine roll+mask adds;
  * conv weight-gradients as ONE (9C, m) · (m, C) contraction of the reused
    patch scratch against the cotangent (``dot_general`` over dim 0 — no
    materialised transpose);
  * time-column weight-gradients via an iota-built (m, 9) tap-validity
    matrix — the exact adjoint of the split lowering's ``t · M`` term;
  * GroupNorm statistics/gradients as segment- and assignment-matrix
    matmuls ((TB, m) / (C, G) iota-built 0/1 matrices, MXU-resident);
  * per-channel/param gradients accumulated across batch tiles in revisited
    output blocks (the TPU grid is sequential, so read-modify-write is
    race-free).

All values in the kernel are 2D with C (=64) lanes — nothing ever takes the
4D relayout path that blew the stack.

reference: torchdiffeq has no fused-kernel counterpart (SURVEY.md §2.3) —
this implements the BASELINE.json north-star's backward direction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .odefunc_pallas import VMEM_BUDGET, _group_assign, bwd_tile_bytes
from .rk_step_pallas import _ones_time_map, _seg_matrix

__all__ = ["odefunc_bwd_rows"]


def _tap_mask(m: int, hw, k: int):
    """Border-validity mask (m, 1) for conv tap k (ky=k//3, kx=k%3)."""
    hh, ww = hw
    r = lax.broadcasted_iota(jnp.int32, (m, 1), 0)
    y = (r // ww) % hh + (k // 3 - 1)
    x = r % ww + (k % 3 - 1)
    return ((y >= 0) & (y < hh) & (x >= 0) & (x < ww)).astype(jnp.float32)


def _tap_mask9(m: int, hw):
    """All nine border masks as one (m, 9) matrix (for the time-column
    weight gradient: dWt = mask9ᵀ · (t ⊙ g))."""
    hh, ww = hw
    r = lax.broadcasted_iota(jnp.int32, (m, 9), 0)
    k = lax.broadcasted_iota(jnp.int32, (m, 9), 1)
    y = (r // ww) % hh + (k // 3 - 1)
    x = r % ww + (k % 3 - 1)
    return ((y >= 0) & (y < hh) & (x >= 0) & (x < ww)).astype(jnp.float32)


def _dot0(a, b):
    """aᵀ @ b without materialising the transpose: contract dim 0 of both
    ((m, K), (m, C) → (K, C))."""
    return lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                           preferred_element_type=jnp.float32, precision=lax.Precision.HIGHEST)


def _fill_patches(src, patch_ref, hw):
    """Write the nine rolled+masked taps of ``src`` (m, C) into the reused
    (m, 9C) VMEM patch scratch (identical staging to the forward rollS)."""
    m, c = src.shape
    for k in range(9):
        off = (k // 3 - 1) * hw[1] + (k % 3 - 1)
        shifted = pltpu.roll(src, (-off) % m, 0) if off else src
        patch_ref[:, k * c:(k + 1) * c] = shifted * _tap_mask(m, hw, k)


def _conv_rows_fwd(src, patch_ref, ws_ref, t_rows, m_tiled, bias, hw):
    """Split-lowered ConcatConv forward on rows: conv(src) + t·M + b."""
    _fill_patches(src, patch_ref, hw)
    out = jnp.dot(patch_ref[:], ws_ref[:],
                  preferred_element_type=jnp.float32, precision=lax.Precision.HIGHEST)
    return out + t_rows * m_tiled[:] + bias[:]


def _conv_rows_bwd_input(g, wsT_ref, hw):
    """Conv input gradient: un-scatter G9 = g @ Wsᵀ through the taps.
    dh[s] = Σ_k roll(mask_k ⊙ G9[:, k], +off_k)[s]."""
    m, c = g.shape
    g9 = jnp.dot(g, wsT_ref[:], preferred_element_type=jnp.float32, precision=lax.Precision.HIGHEST)
    dh = jnp.zeros((m, c), jnp.float32)
    for k in range(9):
        off = (k // 3 - 1) * hw[1] + (k % 3 - 1)
        piece = g9[:, k * c:(k + 1) * c] * _tap_mask(m, hw, k)
        dh = dh + (pltpu.roll(piece, off % m, 0) if off else piece)
    return dh


def _gn_stats_rows(h, seg, segT, assign, rows_per):
    """GroupNorm forward statistics on (m, C) rows: (x̂, inv broadcast to
    rows) — everything per-(sample, group) rides the MXU."""
    c = h.shape[1]
    gsize = c // assign.shape[1]
    n = rows_per * gsize
    s_g = jnp.dot(jnp.dot(seg, h, preferred_element_type=jnp.float32, precision=lax.Precision.HIGHEST),
                  assign, preferred_element_type=jnp.float32, precision=lax.Precision.HIGHEST)
    mean_c = jnp.dot(s_g / n, assign.T, preferred_element_type=jnp.float32, precision=lax.Precision.HIGHEST)
    d = h - jnp.dot(segT, mean_c, preferred_element_type=jnp.float32, precision=lax.Precision.HIGHEST)
    var_g = jnp.dot(jnp.dot(seg, d * d, preferred_element_type=jnp.float32, precision=lax.Precision.HIGHEST),
                    assign, preferred_element_type=jnp.float32, precision=lax.Precision.HIGHEST) / n
    inv_c = jnp.dot(lax.rsqrt(var_g + 1e-5), assign.T,
                    preferred_element_type=jnp.float32, precision=lax.Precision.HIGHEST)
    inv_rows = jnp.dot(segT, inv_c, preferred_element_type=jnp.float32, precision=lax.Precision.HIGHEST)
    return d * inv_rows, inv_rows


def _group_mean_rows(v, seg, segT, assign, rows_per):
    """Per-(sample, group) mean of v, broadcast back to (m, C) rows."""
    gsize = v.shape[1] // assign.shape[1]
    n = rows_per * gsize
    s_g = jnp.dot(jnp.dot(seg, v, preferred_element_type=jnp.float32, precision=lax.Precision.HIGHEST),
                  assign, preferred_element_type=jnp.float32, precision=lax.Precision.HIGHEST)
    return jnp.dot(segT, jnp.dot(s_g / n, assign.T,
                                 preferred_element_type=jnp.float32, precision=lax.Precision.HIGHEST),
                   preferred_element_type=jnp.float32, precision=lax.Precision.HIGHEST)


def _gn_dx_rows(dxhat, xhat, inv_rows, seg, segT, assign, rows_per):
    """GroupNorm input gradient from the x̂ cotangent:
    dx = inv ⊙ (dx̂ − mean_g(dx̂) − x̂ ⊙ mean_g(dx̂ ⊙ x̂))."""
    m1 = _group_mean_rows(dxhat, seg, segT, assign, rows_per)
    m2 = _group_mean_rows(dxhat * xhat, seg, segT, assign, rows_per)
    return inv_rows * (dxhat - m1 - xhat * m2)


def _bwd_rows_kernel(
    t_ref, h_ref, g_ref,
    n1s, n1b, w1s, w1sT, b1, m1t,
    n2s, n2b, w2s, w2sT, b2, m2t,
    n3s, n3b,
    dx_ref, dt_ref,
    dn1s_ref, dn1b_ref, dw1s_ref, dw1t_ref, db1_ref,
    dn2s_ref, dn2b_ref, dw2s_ref, dw2t_ref, db2_ref,
    dn3s_ref, dn3b_ref,
    patch_ref,
    *, groups: int, hw,
):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        for ref in (dn1s_ref, dn1b_ref, dw1s_ref, dw1t_ref, db1_ref,
                    dn2s_ref, dn2b_ref, dw2s_ref, dw2t_ref, db2_ref,
                    dn3s_ref, dn3b_ref):
            ref[:] = jnp.zeros(ref.shape, ref.dtype)

    rows_per = hw[0] * hw[1]
    m, c = h_ref.shape
    tb = m // rows_per
    seg = _seg_matrix(tb, rows_per)
    segT = _seg_matrix(tb, rows_per, transpose=True)
    assign = _group_assign(c, groups)
    mask9 = _tap_mask9(m, hw)
    ones_row = jnp.ones((1, m), jnp.float32)
    ones_col = jnp.ones((c, 1), jnp.float32)
    csum = lambda v: jnp.dot(ones_row, v,
                             preferred_element_type=jnp.float32, precision=lax.Precision.HIGHEST)  # (1, C)

    t_rows = t_ref[:].astype(jnp.float32)  # (m, 1)
    h = h_ref[:].astype(jnp.float32)
    g = g_ref[:].astype(jnp.float32)

    # --- forward recompute, rows-resident --------------------------------
    xh1, inv1 = _gn_stats_rows(h, seg, segT, assign, rows_per)
    y1 = xh1 * n1s[:] + n1b[:]
    r1 = jnp.maximum(y1, 0.0)
    u = _conv_rows_fwd(r1, patch_ref, w1s, t_rows, m1t, b1, hw)
    xh2, inv2 = _gn_stats_rows(u, seg, segT, assign, rows_per)
    y2 = xh2 * n2s[:] + n2b[:]
    r2 = jnp.maximum(y2, 0.0)
    v = _conv_rows_fwd(r2, patch_ref, w2s, t_rows, m2t, b2, hw)
    xh3, inv3 = _gn_stats_rows(v, seg, segT, assign, rows_per)

    # --- GN3 -------------------------------------------------------------
    dn3s_ref[:] = dn3s_ref[:] + csum(g * xh3)
    dn3b_ref[:] = dn3b_ref[:] + csum(g)
    gv = _gn_dx_rows(g * n3s[:], xh3, inv3, seg, segT, assign, rows_per)

    # --- conv2 (patch scratch still holds r2's taps) ---------------------
    dw2s_ref[:] = dw2s_ref[:] + _dot0(patch_ref[:], gv)
    dw2t_ref[:] = dw2t_ref[:] + _dot0(mask9, t_rows * gv)
    db2_ref[:] = db2_ref[:] + csum(gv)
    dt_rows = jnp.dot(gv * m2t[:], ones_col,
                      preferred_element_type=jnp.float32, precision=lax.Precision.HIGHEST)  # (m, 1)
    g_r2 = _conv_rows_bwd_input(gv, w2sT, hw)

    # --- ReLU2 + GN2 -----------------------------------------------------
    g_y2 = g_r2 * (y2 > 0.0)
    dn2s_ref[:] = dn2s_ref[:] + csum(g_y2 * xh2)
    dn2b_ref[:] = dn2b_ref[:] + csum(g_y2)
    gu = _gn_dx_rows(g_y2 * n2s[:], xh2, inv2, seg, segT, assign, rows_per)

    # --- conv1 (restage the scratch with r1's taps) ----------------------
    _fill_patches(r1, patch_ref, hw)
    dw1s_ref[:] = dw1s_ref[:] + _dot0(patch_ref[:], gu)
    dw1t_ref[:] = dw1t_ref[:] + _dot0(mask9, t_rows * gu)
    db1_ref[:] = db1_ref[:] + csum(gu)
    dt_rows = dt_rows + jnp.dot(gu * m1t[:], ones_col,
                                preferred_element_type=jnp.float32, precision=lax.Precision.HIGHEST)
    g_r1 = _conv_rows_bwd_input(gu, w1sT, hw)

    # --- ReLU1 + GN1 -----------------------------------------------------
    g_y1 = g_r1 * (y1 > 0.0)
    dn1s_ref[:] = dn1s_ref[:] + csum(g_y1 * xh1)
    dn1b_ref[:] = dn1b_ref[:] + csum(g_y1)
    dh = _gn_dx_rows(g_y1 * n1s[:], xh1, inv1, seg, segT, assign, rows_per)

    dx_ref[:] = dh.astype(dx_ref.dtype)
    dt_ref[:] = jnp.dot(seg, dt_rows,
                        preferred_element_type=jnp.float32, precision=lax.Precision.HIGHEST).astype(
                            dt_ref.dtype)


def _pick_tile_bwd(b: int, rows_per: int, c: int) -> int:
    """Batch tile for the backward: ~25 live (m, C) row buffers + the
    (m, 9C) patch scratch; at the flagship 7×7×64 state tb=8 is comfortably
    inside the 16 MB scoped-VMEM stack (measured headroom pattern from the
    rows RK-step kernel, which overflowed by 20 KB at tb=32 with a
    comparable working set).  The cap alone was NOT enough: at e.g.
    28×28×64 even tb=8 holds a ~14 MB patch scratch — shrink by the shared
    VMEM budget until the working set fits (code-review r4;
    pallas_supported gates on the tb=1 bound so this always terminates in
    a usable tile)."""
    tb = min(8, b)
    while b % tb:
        tb -= 1
    while tb > 1 and bwd_tile_bytes(tb, rows_per, c) > VMEM_BUDGET:
        tb = max(1, tb // 2)
        while b % tb:
            tb -= 1
    return tb


@functools.partial(jax.jit, static_argnames=("groups", "hw", "interpret"))
def odefunc_bwd_rows(params, t, h, g, *, groups: int, hw, interpret: bool):
    """Fused backward of the ODEfunc on a (B, H, W, C) state: returns
    ``(dparams, dt (B,), dx)`` — the rows-layout replacement for round 2's
    stack-OOM 4D kernel.  ``t`` may be scalar or (B,); broadcast handling
    (summing a broadcast t's cotangent) lives in the caller's VJP rule."""
    b, hh, ww, c = h.shape
    assert (hh, ww) == hw
    rows_per = hh * ww
    t_b = jnp.broadcast_to(jnp.asarray(t, jnp.float32).reshape(-1), (b,))
    t_rows = jnp.repeat(t_b, rows_per)[:, None]

    w1 = params["conv1"]["kernel"].astype(jnp.float32)
    w2 = params["conv2"]["kernel"].astype(jnp.float32)
    w1s = w1[:, :, 1:, :].reshape(9 * c, c)
    w2s = w2[:, :, 1:, :].reshape(9 * c, c)
    m1 = _ones_time_map(w1, hh, ww).reshape(rows_per, c)
    m2 = _ones_time_map(w2, hh, ww).reshape(rows_per, c)

    tb = _pick_tile_bwd(b, rows_per, c)
    m_block = tb * rows_per
    grid = (b // tb,)
    m1t = jnp.tile(m1, (tb, 1))
    m2t = jnp.tile(m2, (tb, 1))
    row1 = lambda v: v.astype(jnp.float32).reshape(1, c)

    rows = lambda: pl.BlockSpec((m_block, c), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
    col = lambda: pl.BlockSpec((m_block, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
    samp_col = lambda: pl.BlockSpec((tb, 1), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)

    def acc(shape):
        nd = len(shape)
        return (jax.ShapeDtypeStruct(shape, jnp.float32),
                pl.BlockSpec(shape, lambda i: (0,) * nd,
                             memory_space=pltpu.VMEM))

    out_shapes = [jax.ShapeDtypeStruct((b * rows_per, c), h.dtype),
                  jax.ShapeDtypeStruct((b, 1), jnp.float32)]
    out_specs = [rows(), samp_col()]
    for shape in ((1, c), (1, c), (9 * c, c), (9, c), (1, c),
                  (1, c), (1, c), (9 * c, c), (9, c), (1, c),
                  (1, c), (1, c)):
        sds, spec = acc(shape)
        out_shapes.append(sds)
        out_specs.append(spec)

    outs = pl.pallas_call(
        functools.partial(_bwd_rows_kernel, groups=groups, hw=hw),
        out_shape=tuple(out_shapes),
        grid=grid,
        in_specs=[col(), rows(), rows()] + [full()] * 14,
        out_specs=tuple(out_specs),
        scratch_shapes=[pltpu.VMEM((m_block, 9 * c), jnp.float32)],
        interpret=interpret,
    )(
        t_rows, h.reshape(b * rows_per, c).astype(jnp.float32),
        g.reshape(b * rows_per, c).astype(jnp.float32),
        row1(params["norm1"]["scale"]), row1(params["norm1"]["bias"]),
        w1s, w1s.T, row1(params["conv1"]["bias"]), m1t,
        row1(params["norm2"]["scale"]), row1(params["norm2"]["bias"]),
        w2s, w2s.T, row1(params["conv2"]["bias"]), m2t,
        row1(params["norm3"]["scale"]), row1(params["norm3"]["bias"]),
    )
    (dx, dt_col, dn1s, dn1b, dw1s, dw1t, db1,
     dn2s, dn2b, dw2s, dw2t, db2, dn3s, dn3b) = outs

    def full_w(dws, dwt):
        dW = jnp.concatenate(
            [dwt.reshape(3, 3, 1, c), dws.reshape(3, 3, c, c)], axis=2)
        return dW

    dparams = {
        "norm1": {"scale": dn1s[0], "bias": dn1b[0]},
        "conv1": {"kernel": full_w(dw1s, dw1t).astype(
                      params["conv1"]["kernel"].dtype),
                  "bias": db1[0]},
        "norm2": {"scale": dn2s[0], "bias": dn2b[0]},
        "conv2": {"kernel": full_w(dw2s, dw2t).astype(
                      params["conv2"]["kernel"].dtype),
                  "bias": db2[0]},
        "norm3": {"scale": dn3s[0], "bias": dn3b[0]},
    }
    return dparams, dt_col[:, 0], dx.reshape(b, hh, ww, c).astype(h.dtype)
