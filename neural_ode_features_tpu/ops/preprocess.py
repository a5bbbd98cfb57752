"""On-device, fused image preprocessing and augmentation.

BASELINE.json: "fuse image decode/normalize/augment preprocessing on-device
so MNIST/CIFAR batches stream straight into the solver."  The host only ships
raw uint8 NHWC batches (4x less PCIe/ICI traffic than f32); everything else —
dequantise, normalise, pad-crop, flip — happens inside the jitted train step
on the VPU, fusing with the stem convolution's input read.

The reference does this on CPU per-sample in torchvision DataLoader workers
(reference: utils.py get_loaders / torchvision transforms — UNVERIFIED,
SURVEY.md §2.1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["normalize", "augment", "normalized_black", "NORM_STATS"]

# Channel statistics. MNIST follows the reference's ToTensor-only convention
# (identity normalisation); CIFAR-10 uses the standard channel stats.
NORM_STATS = {
    "mnist": ((0.0,), (1.0,)),
    "cifar10": ((0.4914, 0.4822, 0.4465), (0.2470, 0.2435, 0.2616)),
}
NORM_STATS["synthetic-mnist"] = NORM_STATS["mnist"]
NORM_STATS["synthetic-cifar10"] = NORM_STATS["cifar10"]


def normalize(x: jnp.ndarray, dataset: str, dtype=jnp.float32) -> jnp.ndarray:
    """uint8 NHWC → normalised float NHWC (fused on device)."""
    mean, std = NORM_STATS[dataset]
    x = x.astype(dtype) / 255.0
    mean = jnp.asarray(mean, dtype)
    std = jnp.asarray(std, dtype)
    return (x - mean) / std


def normalized_black(dataset: str, dtype=jnp.float32) -> jnp.ndarray:
    """Per-channel value a black (0) pixel takes AFTER :func:`normalize` —
    the correct pad fill for augmenting in normalized space."""
    mean, std = NORM_STATS[dataset]
    return (0.0 - jnp.asarray(mean, dtype)) / jnp.asarray(std, dtype)


def augment(key, x: jnp.ndarray, *, pad: int = 4, flip: bool = True,
            fill=0.0) -> jnp.ndarray:
    """Random pad-crop + horizontal flip, vectorised over the batch on device.

    ``x``: float NHWC (normalise first).  One PRNG key per batch.

    The torch reference crops the RAW image with zero (black) padding and
    normalizes afterwards; since this pipeline augments post-normalize, the
    border must be filled with the dataset's *normalized black*
    (:func:`normalized_black`), not 0 — zero is the mean color, not black
    (code-review r4).  Pass ``fill=normalized_black(dataset)``; the default
    0.0 is exact only for identity stats (MNIST).
    """
    b, h, w, c = x.shape
    k_crop, k_flip = jax.random.split(key)

    fill = jnp.asarray(fill, x.dtype)
    # Zero-pad (x - fill), add fill back: border pixels become `fill`
    # per-channel without materialising a constant-valued pad.
    padded = jnp.pad(x - fill, ((0, 0), (pad, pad), (pad, pad), (0, 0))) + fill
    offs = jax.random.randint(k_crop, (b, 2), 0, 2 * pad + 1)

    def crop_one(img, off):
        return jax.lax.dynamic_slice(img, (off[0], off[1], 0), (h, w, c))

    x = jax.vmap(crop_one)(padded, offs)

    if flip:
        do_flip = jax.random.bernoulli(k_flip, 0.5, (b,))
        x = jnp.where(do_flip[:, None, None, None], jnp.flip(x, axis=2), x)
    return x
