"""Analytic FLOP accounting for the ODE-Net forward pass.

Model-FLOPs utilisation (MFU) for the headline bench (VERDICT r1 #9): count
the *useful* work — stem + head + mean-NFE dynamics evaluations per image —
and divide the achieved FLOP/s by the chip's peak.  Per-sample adaptive
stepping executes max-NFE lanes of masked work, so MFU here is deliberately
the model-FLOPs convention (useful work), not hardware-occupancy; the gap
between the two is the straggler overhead the per-sample design trades for
fewer useful evals.

reference: none — the reference has no FLOPs accounting (empty mount,
SURVEY.md §2.3); this is bench-harness infrastructure.
"""

from __future__ import annotations

__all__ = [
    "odenet_flops_per_image",
    "odenet_train_flops_per_image",
    "peak_flops_per_chip",
]


def _conv_flops(k: int, cin: int, cout: int, out_hw: int) -> float:
    # 2 (MAC) × k² × Cin × Cout per output pixel.
    return 2.0 * k * k * cin * cout * out_hw * out_hw


def _gn_flops(hw: int, ch: int) -> float:
    # mean, var, normalise, affine ≈ 8 ops per element (reduction + scale).
    return 8.0 * hw * hw * ch


def odenet_flops_per_image(cfg, image_side: int, mean_nfe: float) -> dict:
    """Analytic forward FLOPs for one image at ``mean_nfe`` dynamics evals.

    Only the 'conv' stem is modelled exactly (the bench default); the 'res'
    stem reuses the same feature-map sizes with its extra convs.  Returns a
    dict with per-part and total FLOPs so the bench JSON can expose the
    breakdown.
    """
    h = cfg.hidden
    s0 = image_side - 2  # conv0 3×3 VALID
    s1 = (s0 + 2 - 4) // 2 + 1  # 4×4 stride-2 pad-1
    s2 = (s1 + 2 - 4) // 2 + 1  # feature-map side inside the ODE block

    if cfg.downsampling == "res":
        stem = (
            _conv_flops(3, cfg.in_channels, h, s0)
            + 2 * _gn_flops(s0, h)
            # block1: 3×3 s2, 3×3, 1×1 s2 shortcut (at s1), GNs
            + _conv_flops(3, h, h, s1) + _conv_flops(3, h, h, s1)
            + _conv_flops(1, h, h, s1) + 2 * _gn_flops(s1, h)
            + _conv_flops(3, h, h, s2) + _conv_flops(3, h, h, s2)
            + _conv_flops(1, h, h, s2) + 2 * _gn_flops(s2, h)
        )
    else:
        stem = (
            _conv_flops(3, cfg.in_channels, h, s0)
            + _gn_flops(s0, h)
            + _conv_flops(4, h, h, s1)
            + _gn_flops(s1, h)
            + _conv_flops(4, h, h, s2)
        )

    # ODEfunc: GN → ReLU → 3×3 conv (h+1 → h) ×2 → GN, all at s2×s2.
    odefunc = (
        3 * _gn_flops(s2, h)
        + 2 * _conv_flops(3, h + 1, h, s2)
    )

    head = _gn_flops(s2, h) + 2.0 * h * cfg.num_classes

    total = stem + head + float(mean_nfe) * odefunc
    return {
        "stem": stem,
        "odefunc_per_eval": odefunc,
        "head": head,
        "total": total,
        "feature_side": s2,
    }


def odenet_train_flops_per_image(
    cfg, image_side: int, nfe_f: float, nfe_b: float
) -> dict:
    """Analytic TRAINING-step FLOPs for one image (adjoint route).

    Counting convention (the standard fwd:bwd ≈ 1:2 rule applied to this
    model's actual eval counts, which differ between the two passes):

    * stem + head: forward once, backward ≈ 2× (grads w.r.t. inputs AND
      parameters) → 3× their forward FLOPs;
    * dynamics forward: ``nfe_f`` ODEfunc evals;
    * dynamics backward (reintegrate adjoint): each of the ``nfe_b``
      augmented evals computes f once (the co-integrated y column) plus
      its VJP (≈ 2× f) → 3× ODEfunc per backward eval.  The seminorm /
      interpolated variants change ``nfe_b`` itself, not the per-eval
      cost (interpolated drops the y column but adds interpolant
      evaluation — within the model error of this estimate).

    Optimizer update / augmentation / loss are O(params + pixels) —
    negligible next to the convs — and excluded, consistent with
    :func:`odenet_flops_per_image`'s model-FLOPs (useful work) convention.
    """
    fwd = odenet_flops_per_image(cfg, image_side, 0.0)
    odefunc = fwd["odefunc_per_eval"]
    total = (
        3.0 * (fwd["stem"] + fwd["head"])
        + float(nfe_f) * odefunc
        + 3.0 * float(nfe_b) * odefunc
    )
    return {
        "stem_head_x3": 3.0 * (fwd["stem"] + fwd["head"]),
        "odefunc_per_eval": odefunc,
        "forward_dyn": float(nfe_f) * odefunc,
        "backward_dyn": 3.0 * float(nfe_b) * odefunc,
        "total": total,
        "feature_side": fwd["feature_side"],
    }


# Peak dense matmul FLOP/s per chip (bf16 MXU path — JAX's DEFAULT conv/
# matmul precision on TPU computes f32 inputs as bf16 multiplies with f32
# accumulation, so the bf16 peak is the honest denominator for both the f32
# and --bf16 bench modes).  Public figures from the TPU system docs.
_PEAK_BF16 = {
    "v6": 918e12,  # Trillium
    "v5p": 459e12,
    "v5e": 197e12,
    "v5 lite": 197e12,
    "v5litepod": 197e12,
    "v4": 275e12,
    "v3": 123e12,
    "v2": 45e12,
}


def peak_flops_per_chip(device_kind: str) -> float | None:
    """Best-effort peak FLOP/s lookup from ``jax.devices()[0].device_kind``;
    None when unknown (CPU, new chip) — callers should emit mfu=null then."""
    kind = device_kind.lower()
    for key, peak in _PEAK_BF16.items():
        if key in kind:
            return peak
    return None
