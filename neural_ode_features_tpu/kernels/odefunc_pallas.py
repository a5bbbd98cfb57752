"""Pallas-fused ODE dynamics: the whole f(t, h) as ONE TPU kernel.

BASELINE.json north star: "the conv+GroupNorm ODEfunc fused into Pallas
kernels so each RK stage is one XLA-resident block."  This kernel computes

    GN → ReLU → ConcatConv3×3 → GN → ReLU → ConcatConv3×3 → GN

for a batch tile entirely in VMEM: the feature map is loaded from HBM once
and written once per stage evaluation, instead of round-tripping between the
seven XLA fusions the jnp path lowers to.  The 3×3 convs are expressed as
nine shifted (TB·H·W, C+1) @ (C+1, C) matmuls on the MXU with fp32
accumulation; GroupNorm statistics are computed in fp32 on the VPU.

Scope: forward AND backward.  :func:`odefunc_pallas_vjp` pairs the forward
kernel with a fused backward kernel (``jax.custom_vjp``): the backward
recomputes the forward intermediates in VMEM (flash-attention-style — the
residuals are just ``(params, t, h)``) and emits ``(dh, dt, dθ)`` in one
kernel, accumulating the parameter gradients across batch tiles via a
revisited output block.  This is the "custom-VJP kernel pair" the adjoint
needs to run fused dynamics inside ``jax.vjp`` (VERDICT r1 weak #2).

Equivalence with the jnp path (values and gradients) is asserted by
tests/test_pallas.py (CPU interpreter mode) and bench_tolerance_sweep's TPU
check.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["odefunc_pallas", "odefunc_pallas_vjp", "pallas_supported"]


def _group_assign(c: int, groups: int):
    """0/1 channel→group assignment matrix (C, G) built *inside* the kernel
    from iota (pallas_call rejects captured constant arrays).  Mosaic cannot
    reshape across the lane dimension ((TB, C) → (TB, G, C/G) is an
    'unsupported shape cast'), so group reductions are expressed as tiny MXU
    matmuls with this matrix instead."""
    gsize = c // groups
    ch = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0)
    grp = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
    return (ch // gsize == grp).astype(jnp.float32)


def _group_norm_in_kernel(h, scale, bias, groups, eps=1e-5):
    """GroupNorm on a (TB, H, W, C) value in fp32; channel→group sums and the
    group→channel broadcast are matmuls with a constant assignment matrix."""
    tb, hh, ww, c = h.shape
    gsize = c // groups
    n = hh * ww * gsize
    assign = _group_assign(c, groups)  # (C, G)

    h32 = h.astype(jnp.float32)
    s_c = jnp.sum(h32, axis=(1, 2))  # (TB, C)
    s_g = jnp.dot(s_c, assign, preferred_element_type=jnp.float32)  # (TB, G)
    mean_g = s_g / n
    # Centered variance (matches jnp.var): the one-pass E[x²]−E[x]² form
    # cancels catastrophically in fp32 when |mean| ≫ std and can round
    # negative, turning rsqrt into NaN.
    mean_bc = jnp.dot(mean_g, assign.T, preferred_element_type=jnp.float32)
    d = h32 - mean_bc[:, None, None, :]
    s2_c = jnp.sum(d * d, axis=(1, 2))
    var_g = jnp.dot(s2_c, assign, preferred_element_type=jnp.float32) / n
    inv_g = jax.lax.rsqrt(var_g + eps)  # (TB, G)

    # Broadcast group stats back to channels: (TB, G) @ (G, C).
    inv_c = jnp.dot(inv_g, assign.T, preferred_element_type=jnp.float32)
    out = d * inv_c[:, None, None, :]
    return out * scale + bias


def _concat_conv3x3(h, t_col, w, b):
    """h (TB, H, W, C) fp32, t_col (TB, 1), w (3, 3, C+1, C), b (C,).
    Time channel is concatenated before zero-padding (exact parity with
    ops/layers.concat_time_channel + SAME conv)."""
    tb, hh, ww, c = h.shape
    t_map = jnp.broadcast_to(t_col[:, :, None, None], (tb, 1, hh, ww))
    t_map = jnp.transpose(t_map, (0, 2, 3, 1))  # (TB, H, W, 1)
    ht = jnp.concatenate([t_map, h], axis=-1)  # (TB, H, W, C+1)
    hp = jnp.pad(ht, ((0, 0), (1, 1), (1, 1), (0, 0)))

    acc = jnp.zeros((tb * hh * ww, c), jnp.float32)
    for ky in range(3):
        for kx in range(3):
            patch = hp[:, ky : ky + hh, kx : kx + ww, :].reshape(
                tb * hh * ww, c + 1
            )
            acc = acc + jnp.dot(
                patch, w[ky, kx], preferred_element_type=jnp.float32
            )
    return acc.reshape(tb, hh, ww, c) + b


def _odefunc_kernel(
    t_ref, x_ref,
    n1s_ref, n1b_ref, w1_ref, b1_ref,
    n2s_ref, n2b_ref, w2_ref, b2_ref,
    n3s_ref, n3b_ref,
    out_ref,
    *, groups: int,
):
    t_col = t_ref[:]  # (TB, 1)
    h = x_ref[:]  # (TB, H, W, C)

    out = _group_norm_in_kernel(h, n1s_ref[:], n1b_ref[:], groups)
    out = jnp.maximum(out, 0.0)
    out = _concat_conv3x3(out, t_col, w1_ref[:], b1_ref[:])
    out = _group_norm_in_kernel(out, n2s_ref[:], n2b_ref[:], groups)
    out = jnp.maximum(out, 0.0)
    out = _concat_conv3x3(out, t_col, w2_ref[:], b2_ref[:])
    out = _group_norm_in_kernel(out, n3s_ref[:], n3b_ref[:], groups)
    out_ref[:] = out.astype(out_ref.dtype)


def _pick_tile(b: int, hh: int, ww: int, c: int, copies: int = 6) -> int:
    """Largest batch tile ≤64 dividing B whose working set fits a VMEM
    budget (``copies`` live (TB, H+2, W+2, C+1) fp32 buffers: ≈6 for the
    forward, ≈16 for the recompute-everything backward)."""
    tb = min(64, b)
    while b % tb:
        tb -= 1
    budget = 6 * 1024 * 1024  # leave headroom below ~16 MiB VMEM
    while tb > 1 and copies * tb * (hh + 2) * (ww + 2) * (c + 1) * 4 > budget:
        tb = max(1, tb // 2)
        while b % tb:
            tb -= 1
    return tb


def pallas_supported(h: jnp.ndarray, groups: int) -> bool:
    """The kernel covers the reference architecture family: NHWC maps with
    channels divisible by groups and a batch tile whose working set fits in
    VMEM (the tile shrinks automatically; reject only if even tb=1 would
    blow the budget)."""
    if h.ndim != 4:
        return False
    b, hh, ww, c = h.shape
    if c % groups or c > 512:
        return False
    return 6 * (hh + 2) * (ww + 2) * (c + 1) * 4 <= 6 * 1024 * 1024


def odefunc_pallas(
    params, t, h: jnp.ndarray, *, groups: int = 32,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Fused ODE dynamics evaluation.  Drop-in equal (≤1e-5 f32) to
    models/odenet.odefunc_apply for float32 inputs.

    ``t``: scalar or (B,); ``h``: (B, H, W, C) float32.  ``interpret``
    defaults to True on the CPU backend (Mosaic only compiles for TPU).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    return _odefunc_pallas(params, t, h, groups=groups, interpret=interpret)


@functools.partial(jax.jit, static_argnames=("groups", "interpret"))
def _odefunc_pallas(
    params, t, h: jnp.ndarray, *, groups: int, interpret: bool
) -> jnp.ndarray:
    b, hh, ww, c = h.shape
    t = jnp.broadcast_to(jnp.asarray(t, h.dtype).reshape(-1), (b,))
    t_col = t[:, None]

    # Batch tile: largest divisor of B ≤ 64 whose working set fits VMEM.
    tb = _pick_tile(b, hh, ww, c)
    grid = (b // tb,)

    w1 = params["conv1"]["kernel"].astype(jnp.float32)
    w2 = params["conv2"]["kernel"].astype(jnp.float32)

    def block():
        return pl.BlockSpec(
            (tb, hh, ww, c), lambda g: (g, 0, 0, 0), memory_space=pltpu.VMEM
        )

    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_odefunc_kernel, groups=groups),
        out_shape=jax.ShapeDtypeStruct(h.shape, h.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tb, 1), lambda g: (g, 0), memory_space=pltpu.VMEM),
            block(),
            full(), full(), full(), full(),
            full(), full(), full(), full(),
            full(), full(),
        ],
        out_specs=block(),
        interpret=interpret,
    )(
        t_col, h,
        params["norm1"]["scale"], params["norm1"]["bias"], w1,
        params["conv1"]["bias"],
        params["norm2"]["scale"], params["norm2"]["bias"], w2,
        params["conv2"]["bias"],
        params["norm3"]["scale"], params["norm3"]["bias"],
    )


# ---------------------------------------------------------------------------
# Fused backward kernel (the custom-VJP pair)
# ---------------------------------------------------------------------------
def _gn_stats(h, groups, eps=1e-5):
    """Forward GroupNorm statistics for recompute-in-backward: returns
    (x_hat fp32 (TB, H, W, C), inv_c (TB, C))."""
    tb, hh, ww, c = h.shape
    gsize = c // groups
    n = hh * ww * gsize
    assign = _group_assign(c, groups)
    h32 = h.astype(jnp.float32)
    s_g = jnp.dot(jnp.sum(h32, axis=(1, 2)), assign,
                  preferred_element_type=jnp.float32)
    mean_bc = jnp.dot(s_g / n, assign.T, preferred_element_type=jnp.float32)
    d = h32 - mean_bc[:, None, None, :]
    var_g = jnp.dot(jnp.sum(d * d, axis=(1, 2)), assign,
                    preferred_element_type=jnp.float32) / n
    inv_c = jnp.dot(jax.lax.rsqrt(var_g + eps), assign.T,
                    preferred_element_type=jnp.float32)
    return d * inv_c[:, None, None, :], inv_c


def _group_mean_bc(z, groups):
    """Per-(sample, group) mean of z over its group's (H, W, C/G) elements,
    broadcast back to channels: (TB, H, W, C) → (TB, C)."""
    tb, hh, ww, c = z.shape
    gsize = c // groups
    n = hh * ww * gsize
    assign = _group_assign(c, groups)
    s_g = jnp.dot(jnp.sum(z, axis=(1, 2)), assign,
                  preferred_element_type=jnp.float32)
    return jnp.dot(s_g / n, assign.T, preferred_element_type=jnp.float32)


def _gn_dx(dxhat, x_hat, inv_c, groups):
    """GroupNorm input gradient from the x̂ cotangent:
    dx = inv · (dx̂ − mean_g(dx̂) − x̂ · mean_g(dx̂·x̂))."""
    m1 = _group_mean_bc(dxhat, groups)[:, None, None, :]
    m2 = _group_mean_bc(dxhat * x_hat, groups)[:, None, None, :]
    return inv_c[:, None, None, :] * (dxhat - m1 - x_hat * m2)


def _concat_conv3x3_bwd(g, src, t_col, w):
    """Backward of :func:`_concat_conv3x3` for one tile.

    ``g`` (TB, H, W, C) output cotangent, ``src`` (TB, H, W, C) the conv's
    (pre-concat) input, ``t_col`` (TB, 1), ``w`` (3, 3, C+1, C).
    Returns (d_src, d_t (TB,), dW (3,3,C+1,C), db (C,)) — d input channel 0
    is the time channel, folded into d_t."""
    tb, hh, ww, c = g.shape
    t_map = jnp.broadcast_to(t_col[:, :, None, None], (tb, 1, hh, ww))
    t_map = jnp.transpose(t_map, (0, 2, 3, 1))
    ht = jnp.concatenate([t_map, src.astype(jnp.float32)], axis=-1)
    hp = jnp.pad(ht, ((0, 0), (1, 1), (1, 1), (0, 0)))
    g32 = g.astype(jnp.float32)
    g_flat = g32.reshape(tb * hh * ww, c)
    gp = jnp.pad(g32, ((0, 0), (1, 1), (1, 1), (0, 0)))

    dw = []
    dht = jnp.zeros((tb, hh, ww, c + 1), jnp.float32)
    for ky in range(3):
        row = []
        for kx in range(3):
            patch = hp[:, ky : ky + hh, kx : kx + ww, :].reshape(
                tb * hh * ww, c + 1
            )
            row.append(jnp.dot(patch.T, g_flat,
                               preferred_element_type=jnp.float32))
            # d ht[j,i] += g[j+1−ky, i+1−kx] @ w[ky,kx]ᵀ  (see forward index
            # algebra): with g padded by 1 this is the (2−ky, 2−kx) patch.
            gpatch = gp[:, 2 - ky : 2 - ky + hh, 2 - kx : 2 - kx + ww, :]
            dht = dht + jnp.dot(
                gpatch.reshape(tb * hh * ww, c), w[ky, kx].T,
                preferred_element_type=jnp.float32,
            ).reshape(tb, hh, ww, c + 1)
        dw.append(row)
    dW = jnp.stack([jnp.stack(r) for r in dw])  # (3, 3, C+1, C)
    db = jnp.sum(g_flat, axis=0)
    # Keep a trailing size-1 axis: Mosaic rejects reductions over both
    # trailing dims unless the result ends in a 1-axis (hardware-measured).
    d_t = jnp.sum(dht[..., :1], axis=(1, 2))  # (TB, 1)
    d_src = dht[..., 1:]
    return d_src, d_t, dW, db


def _odefunc_bwd_kernel(
    t_ref, x_ref,
    n1s_ref, n1b_ref, w1_ref, b1_ref,
    n2s_ref, n2b_ref, w2_ref, b2_ref,
    n3s_ref, n3b_ref,
    g_ref,
    dx_ref, dt_ref,
    dn1s_ref, dn1b_ref, dw1_ref, db1_ref,
    dn2s_ref, dn2b_ref, dw2_ref, db2_ref,
    dn3s_ref, dn3b_ref,
    *, groups: int,
):
    # Parameter-gradient accumulators live in one revisited output block;
    # zero them on the first batch tile, then accumulate (the TPU grid is
    # sequential, so read-modify-write is race-free).
    @pl.when(pl.program_id(0) == 0)
    def _init():
        for ref in (dn1s_ref, dn1b_ref, dw1_ref, db1_ref,
                    dn2s_ref, dn2b_ref, dw2_ref, db2_ref,
                    dn3s_ref, dn3b_ref):
            ref[:] = jnp.zeros(ref.shape, ref.dtype)

    t_col = t_ref[:]
    h = x_ref[:]
    g = g_ref[:].astype(jnp.float32)
    w1 = w1_ref[:]
    w2 = w2_ref[:]
    n1s, n2s, n3s = n1s_ref[:], n2s_ref[:], n3s_ref[:]

    # --- recompute the forward intermediates in VMEM -----------------------
    xh1, inv1 = _gn_stats(h, groups)
    y1 = xh1 * n1s + n1b_ref[:]
    r1 = jnp.maximum(y1, 0.0)
    u = _concat_conv3x3(r1, t_col, w1, b1_ref[:])
    xh2, inv2 = _gn_stats(u, groups)
    y2 = xh2 * n2s + n2b_ref[:]
    r2 = jnp.maximum(y2, 0.0)
    v = _concat_conv3x3(r2, t_col, w2, b2_ref[:])
    xh3, inv3 = _gn_stats(v, groups)

    # --- GN3 ---------------------------------------------------------------
    dn3s_ref[:] = dn3s_ref[:] + jnp.sum(g * xh3, axis=(0, 1, 2))
    dn3b_ref[:] = dn3b_ref[:] + jnp.sum(g, axis=(0, 1, 2))
    gv = _gn_dx(g * n3s, xh3, inv3, groups)

    # --- conv2 ---------------------------------------------------------------
    g_r2, dt2, dW2, db2 = _concat_conv3x3_bwd(gv, r2, t_col, w2)
    dw2_ref[:] = dw2_ref[:] + dW2
    db2_ref[:] = db2_ref[:] + db2

    # --- ReLU2 + GN2 ---------------------------------------------------------
    g_y2 = g_r2 * (y2 > 0.0)
    dn2s_ref[:] = dn2s_ref[:] + jnp.sum(g_y2 * xh2, axis=(0, 1, 2))
    dn2b_ref[:] = dn2b_ref[:] + jnp.sum(g_y2, axis=(0, 1, 2))
    gu = _gn_dx(g_y2 * n2s, xh2, inv2, groups)

    # --- conv1 ---------------------------------------------------------------
    g_r1, dt1, dW1, db1 = _concat_conv3x3_bwd(gu, r1, t_col, w1)
    dw1_ref[:] = dw1_ref[:] + dW1
    db1_ref[:] = db1_ref[:] + db1

    # --- ReLU1 + GN1 ---------------------------------------------------------
    g_y1 = g_r1 * (y1 > 0.0)
    dn1s_ref[:] = dn1s_ref[:] + jnp.sum(g_y1 * xh1, axis=(0, 1, 2))
    dn1b_ref[:] = dn1b_ref[:] + jnp.sum(g_y1, axis=(0, 1, 2))
    dh = _gn_dx(g_y1 * n1s, xh1, inv1, groups)

    dx_ref[:] = dh.astype(dx_ref.dtype)
    dt_ref[:] = (dt1 + dt2).astype(dt_ref.dtype)


@functools.partial(jax.jit, static_argnames=("groups", "interpret"))
def _odefunc_pallas_bwd(params, t, h, g, *, groups: int, interpret: bool):
    b, hh, ww, c = h.shape
    t_b = jnp.broadcast_to(jnp.asarray(t, h.dtype).reshape(-1), (b,))
    t_col = t_b[:, None]
    w1 = params["conv1"]["kernel"].astype(jnp.float32)
    w2 = params["conv2"]["kernel"].astype(jnp.float32)

    # The backward holds ~16 live fp32 copies of the padded tile.
    tb = _pick_tile(b, hh, ww, c, copies=16)
    grid = (b // tb,)

    def block():
        return pl.BlockSpec(
            (tb, hh, ww, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        )

    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    tcol_spec = pl.BlockSpec((tb, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)

    def acc(shape):
        # Revisited accumulator: every grid step maps to block (0, ...).
        nd = len(shape)
        return (
            jax.ShapeDtypeStruct(shape, jnp.float32),
            pl.BlockSpec(shape, lambda i: (0,) * nd,
                         memory_space=pltpu.VMEM),
        )

    out_shapes = [
        jax.ShapeDtypeStruct(h.shape, h.dtype),       # dx
        jax.ShapeDtypeStruct((b, 1), jnp.float32),    # dt per sample
    ]
    out_specs = [block(), tcol_spec]
    for shape in ((c,), (c,), (3, 3, c + 1, c), (c,),
                  (c,), (c,), (3, 3, c + 1, c), (c,),
                  (c,), (c,)):
        sds, spec = acc(shape)
        out_shapes.append(sds)
        out_specs.append(spec)

    outs = pl.pallas_call(
        functools.partial(_odefunc_bwd_kernel, groups=groups),
        out_shape=tuple(out_shapes),
        grid=grid,
        in_specs=[
            tcol_spec, block(),
            full(), full(), full(), full(),
            full(), full(), full(), full(),
            full(), full(),
            block(),
        ],
        out_specs=tuple(out_specs),
        interpret=interpret,
    )(
        t_col, h,
        params["norm1"]["scale"], params["norm1"]["bias"], w1,
        params["conv1"]["bias"],
        params["norm2"]["scale"], params["norm2"]["bias"], w2,
        params["conv2"]["bias"],
        params["norm3"]["scale"], params["norm3"]["bias"],
        g,
    )
    (dx, dt_col, dn1s, dn1b, dw1, db1, dn2s, dn2b, dw2, db2,
     dn3s, dn3b) = outs
    dparams = {
        "norm1": {"scale": dn1s, "bias": dn1b},
        "conv1": {"kernel": dw1.astype(params["conv1"]["kernel"].dtype),
                  "bias": db1},
        "norm2": {"scale": dn2s, "bias": dn2b},
        "conv2": {"kernel": dw2.astype(params["conv2"]["kernel"].dtype),
                  "bias": db2},
        "norm3": {"scale": dn3s, "bias": dn3b},
    }
    return dparams, dt_col[:, 0], dx


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def odefunc_pallas_vjp(params, t, h, groups: int = 32,
                       interpret: bool | None = None):
    """Differentiable fused dynamics: Pallas forward + fused Pallas backward
    (``jax.custom_vjp``).  Gradients match ``jax.vjp`` of the jnp
    ``odefunc_apply`` to f32 roundoff (tests/test_pallas.py); this is the
    entry the adjoint's augmented dynamics can call under ``jax.vjp`` so
    both training directions run fused kernels."""
    return odefunc_pallas(params, t, h, groups=groups, interpret=interpret)


def _vjp_fwd(params, t, h, groups, interpret):
    out = odefunc_pallas(params, t, h, groups=groups, interpret=interpret)
    return out, (params, t, h)


def _vjp_bwd(groups, interpret, residuals, g):
    params, t, h = residuals
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    dparams, dt_b, dx = _odefunc_pallas_bwd(
        params, t, h, g, groups=groups, interpret=interpret
    )
    t_arr = jnp.asarray(t)
    # The forward broadcasts t (scalar / (1,) / (B,)) to (B,): the cotangent
    # must undo that broadcast — sum over the broadcasted axis and reshape
    # back to t's own shape (a (1,) t with a (B,) cotangent would otherwise
    # corrupt the adjoint's flat augmented state).
    if t_arr.size == 1:
        dt = jnp.sum(dt_b).reshape(t_arr.shape).astype(t_arr.dtype)
    else:
        dt = dt_b.astype(t_arr.dtype)
    return dparams, dt, dx.astype(h.dtype)


odefunc_pallas_vjp.defvjp(_vjp_fwd, _vjp_bwd)
