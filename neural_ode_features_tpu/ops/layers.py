"""Functional NN layers with explicit parameter pytrees.

The model layer of the framework deliberately avoids a module framework:
parameters are plain nested dicts with stable, torch-checkpoint-convertible
names (BASELINE.json: "preserve … checkpoint format"), and every layer is a
pure function — which is what lets the ODE dynamics be differentiated inside
``jax.custom_vjp`` and traced inside ``lax.while_loop`` without framework
magic.

TPU-first choices:
  * NHWC layout everywhere (TPU-native; the reference is NCHW torch).
  * convs via ``lax.conv_general_dilated`` with ``preferred_element_type``
    fp32 so bf16 inputs still accumulate in fp32 on the MXU.
  * initialisers reproduce torch's defaults (kaiming-uniform with a=√5 ⇒
    U(±1/√fan_in) for conv/linear weight *and* bias) so training dynamics are
    comparable with the reference at equal seeds/hyperparams.

Reference counterparts (all UNVERIFIED — empty mount, SURVEY.md §0):
model.py ``ConcatConv2d``/``ODEfunc``/norm helpers (:~20-140).
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    "init_conv",
    "conv2d",
    "init_group_norm",
    "group_norm",
    "init_linear",
    "linear",
    "global_avg_pool",
    "concat_conv2d",
    "concat_time_channel",
]

Params = dict[str, Any]


def _torch_uniform(key, shape, fan_in, dtype):
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def init_conv(
    key, kh: int, kw: int, cin: int, cout: int, *, bias: bool = True,
    dtype=jnp.float32,
) -> Params:
    """Conv kernel in HWIO layout; torch-default kaiming-uniform(a=√5) init."""
    k_w, k_b = jax.random.split(key)
    fan_in = kh * kw * cin
    p = {"kernel": _torch_uniform(k_w, (kh, kw, cin, cout), fan_in, dtype)}
    if bias:
        p["bias"] = _torch_uniform(k_b, (cout,), fan_in, dtype)
    return p


def conv2d(
    params: Params,
    x: jnp.ndarray,
    *,
    stride: int = 1,
    padding="SAME",
    transpose: bool = False,
) -> jnp.ndarray:
    """NHWC conv (or transposed conv) on the MXU with fp32 accumulation.

    ``padding``: 'SAME' | 'VALID' | int p (symmetric) | explicit seq.
    Integer padding uses torch semantics in BOTH directions: for
    ``transpose=True`` it is converted to lax's convention (k-1-p per dim),
    so ConvTranspose2d(k, s, p) shapes match torch's
    (in-1)*s - 2p + k.
    """
    kernel = params["kernel"].astype(x.dtype)
    # For f32 inputs, request f32 output explicitly.  For bf16 inputs the
    # MXU accumulates in f32 internally regardless; requesting a WIDER
    # output dtype than the inputs breaks the conv's VJP in jax 0.9 (the
    # transpose rule feeds the f32 cotangent into a conv against the bf16
    # kernel -> dtype mismatch), so there the output stays bf16 and the
    # downstream GroupNorm recomputes statistics in f32.
    preferred = jnp.float32 if x.dtype == jnp.float32 else None
    if isinstance(padding, int):
        if transpose:
            kh, kw = kernel.shape[0], kernel.shape[1]
            padding = [(kh - 1 - padding,) * 2, (kw - 1 - padding,) * 2]
        else:
            padding = [(padding, padding), (padding, padding)]
    if transpose:
        out = lax.conv_transpose(
            x,
            kernel,
            strides=(stride, stride),
            padding=padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=preferred,
        )
    else:
        out = lax.conv_general_dilated(
            x,
            kernel,
            window_strides=(stride, stride),
            padding=padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=preferred,
        )
    out = out.astype(x.dtype)
    if "bias" in params:
        out = out + params["bias"].astype(x.dtype)
    return out


def init_group_norm(c: int, *, dtype=jnp.float32) -> Params:
    return {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}


def group_norm(
    params: Params, x: jnp.ndarray, *, groups: int = 32, eps: float = 1e-5
) -> jnp.ndarray:
    """GroupNorm over NHWC: normalise within (H, W, C/G) per group.

    Statistics are computed in fp32 regardless of input dtype (bf16-safe).
    """
    b, h, w, c = x.shape
    g = min(groups, c)
    xg = x.reshape(b, h, w, g, c // g).astype(jnp.float32)
    mean = jnp.mean(xg, axis=(1, 2, 4), keepdims=True)
    var = jnp.var(xg, axis=(1, 2, 4), keepdims=True)
    xg = (xg - mean) * lax.rsqrt(var + eps)
    out = xg.reshape(b, h, w, c).astype(x.dtype)
    return out * params["scale"].astype(x.dtype) + params["bias"].astype(x.dtype)


def init_linear(key, din: int, dout: int, *, dtype=jnp.float32) -> Params:
    k_w, k_b = jax.random.split(key)
    return {
        "kernel": _torch_uniform(k_w, (din, dout), din, dtype),
        "bias": _torch_uniform(k_b, (dout,), din, dtype),
    }


def linear(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    preferred = jnp.float32 if x.dtype == jnp.float32 else None
    return (
        jnp.dot(x, params["kernel"].astype(x.dtype),
                preferred_element_type=preferred).astype(x.dtype)
        + params["bias"].astype(x.dtype)
    )


def global_avg_pool(x: jnp.ndarray) -> jnp.ndarray:
    """AdaptiveAvgPool2d(1) + flatten: NHWC → (N, C)."""
    return jnp.mean(x, axis=(1, 2))


def concat_conv2d(params: Params, t, x: jnp.ndarray, *,
                  padding: int = 1) -> jnp.ndarray:
    """ConcatConv2d (reference model.py:~20, UNVERIFIED) via the *split*
    lowering: mathematically identical to
    ``conv2d(params, concat_time_channel(t, x))`` but without the odd
    (C+1)-channel contraction that pads badly onto MXU lanes —

        conv(concat(t·1, x), W) = conv(x, W[:,:,1:,:]) + t · M,
        M = conv(ones_map, W[:,:,:1,:])   (border-aware tap sums)

    The ones-map conv reproduces the zero-padding of the broadcast t-channel
    exactly (interior pixels get t·Σ_taps W₀, border pixels the partial
    sum), so the split is exact up to f32 reassociation (~1e-4 measured).
    Measured ~6% faster per dynamics eval on TPU v5e at 7×7×64.
    ``t``: shape ``()`` or ``(B,)``.
    """
    kernel = params["kernel"]
    out = conv2d({"kernel": kernel[:, :, 1:, :], "bias": params["bias"]},
                 x, padding=padding)
    w_t = kernel[:, :, :1, :].astype(x.dtype)
    b, h, w, _ = x.shape
    ones = jnp.ones((1, h, w, 1), x.dtype)
    m = lax.conv_general_dilated(
        ones, w_t, window_strides=(1, 1),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32 if x.dtype == jnp.float32 else None,
    ).astype(x.dtype)
    t = jnp.asarray(t, x.dtype).reshape(-1, 1, 1, 1)
    return out + t * m


def concat_time_channel(t, x: jnp.ndarray) -> jnp.ndarray:
    """Broadcast scalar-or-per-sample ``t`` to an extra NHWC channel.

    The time-conditioning trick of the reference's ``ConcatConv2d``
    (model.py:~20, UNVERIFIED): dynamics become genuinely time-dependent by
    feeding t as a constant feature map.  Accepts ``t`` of shape ``()`` or
    ``(B,)`` (per-sample integration time).
    """
    b, h, w, _ = x.shape
    t = jnp.asarray(t, x.dtype)
    t = jnp.broadcast_to(t.reshape(-1, 1, 1, 1), (b, h, w, 1))
    return jnp.concatenate([t, x], axis=-1)
