"""Pallas-fused ODE dynamics: the whole f(t, h) as ONE TPU kernel.

BASELINE.json north star: "the conv+GroupNorm ODEfunc fused into Pallas
kernels so each RK stage is one XLA-resident block."  This kernel computes

    GN → ReLU → ConcatConv3×3 → GN → ReLU → ConcatConv3×3 → GN

for a batch tile entirely in VMEM: the feature map is loaded from HBM once
and written once per stage evaluation, instead of round-tripping between the
seven XLA fusions the jnp path lowers to.  The 3×3 convs are expressed as
nine shifted (TB·H·W, C+1) @ (C+1, C) matmuls on the MXU with fp32
accumulation and Mosaic's default bf16 multiplies — deliberately, that IS
parity with the production jnp path (XLA convs default to bf16 multiplies
on TPU).  GroupNorm statistics, by contrast, are strict fp32: their
assignment matmuls pin ``Precision.HIGHEST``, because Mosaic's default
would round the f32 channel sums to bf16 in the 0/1-matrix multiply
(code-review r4; same trap class as the r4 solver-precision incident).

reference: torchdiffeq has no kernel counterpart — this implements
BASELINE.json's "fused ODEfunc kernel" north star (SURVEY.md §2.3
UNVERIFIED).

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
    s_g = jnp.dot(s_c, assign, preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)  # (TB, G)
    mean_g = s_g / n
    # Centered variance (matches jnp.var): the one-pass E[x²]−E[x]² form
    # cancels catastrophically in fp32 when |mean| ≫ std and can round
    # negative, turning rsqrt into NaN.
    mean_bc = jnp.dot(mean_g, assign.T, preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)
    d = h32 - mean_bc[:, None, None, :]
    s2_c = jnp.sum(d * d, axis=(1, 2))
    var_g = jnp.dot(s2_c, assign, preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST) / n
    inv_g = jax.lax.rsqrt(var_g + eps)  # (TB, G)

    # Broadcast group stats back to channels: (TB, G) @ (G, C).
    inv_c = jnp.dot(inv_g, assign.T, preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)
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


# Shared VMEM budget policy (forward tile picker here, backward tile picker
# in odefunc_bwd_rows.py — which imports these to stay in sync): leave
# headroom below Mosaic's ~16 MiB scoped-VMEM stack.
VMEM_BUDGET = 6 * 1024 * 1024
# Backward rows-kernel working set per (tile·H·W) row: one (m, 9C) patch
# scratch (= 9 C-columns) + ~25 live (m, C) row buffers.
BWD_ROW_BUFFERS = 34


def bwd_tile_bytes(tb: int, rows_per: int, c: int) -> int:
    """Backward rows-kernel VMEM working set for a batch tile of ``tb``."""
    return tb * rows_per * BWD_ROW_BUFFERS * c * 4


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
    blow the budget).

    Gates on the FORWARD working set only: shapes whose backward rows
    kernel would not fit (``bwd_tile_bytes(1, ...) > VMEM_BUDGET``) still
    dispatch the forward here — differentiation through them takes the jnp
    backward fallback in ``_vjp_bwd`` instead of stack-OOMing at Mosaic
    compile time (code-review r4, both directions)."""
    if h.ndim != 4:
        return False
    b, hh, ww, c = h.shape
    if c % groups or c > 512:
        return False
    return 6 * (hh + 2) * (ww + 2) * (c + 1) * 4 <= VMEM_BUDGET


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
# Fused backward (the custom-VJP pair) — rows-layout kernel, see
# odefunc_bwd_rows.py.  Round 2's 4D backward kernel compiled but overflowed
# Mosaic's scoped-VMEM stack on hardware (57 MB vs 16 MB: unrolled 9-tap
# conv backwards don't share stack slots); the rows layout stages taps
# through one reused VMEM scratch and keeps every value 2D.
# ---------------------------------------------------------------------------
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


def _jnp_odefunc(params, t, h, groups):
    """Pure-jnp mirror of the kernel's dynamics (GN→ReLU→concat-conv ×2 →
    GN), used only to derive the backward when the rows kernel's working
    set does not fit VMEM.  Kept in lockstep with models/odenet.py's f32
    path (tests/test_pallas.py asserts gradient equality through it)."""
    from ..ops.layers import concat_conv2d, group_norm

    out = jax.nn.relu(group_norm(params["norm1"], h, groups=groups))
    out = concat_conv2d(params["conv1"], t, out, padding=1)
    out = jax.nn.relu(group_norm(params["norm2"], out, groups=groups))
    out = concat_conv2d(params["conv2"], t, out, padding=1)
    return group_norm(params["norm3"], out, groups=groups)


def _vjp_bwd(groups, interpret, residuals, g):
    params, t, h = residuals
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    _, hh, ww, c = h.shape
    if bwd_tile_bytes(1, hh * ww, c) > VMEM_BUDGET:
        # The backward rows kernel cannot fit even a tb=1 tile for this
        # state (e.g. 28×28 maps): differentiate the mathematically-equal
        # jnp dynamics instead of OOMing Mosaic's scoped-VMEM stack.  The
        # forward stays fused; gradients match the kernel pair to f32
        # roundoff (same contraction order as the jnp reference).
        _, pullback = jax.vjp(
            lambda p, tt, x: _jnp_odefunc(p, tt, x, groups), params, t, h)
        return pullback(g)
    from .odefunc_bwd_rows import odefunc_bwd_rows

    dparams, dt_b, dx = odefunc_bwd_rows(
        params, t, h, g, groups=groups, hw=h.shape[1:3], interpret=interpret
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
