"""Pytree ⇄ flat-matrix conversion for the solver core.

The integrator operates on a single dense ``(B, N)`` float matrix — one row
per independently-controlled sample — so that error norms, accept/reject
masks, and dense-output fits are plain 2-D tensor ops that tile cleanly onto
the TPU VPU ((8, 128) lanes).  The reference solves pytrees-of-tensors with
per-tensor bookkeeping instead (reference: torchdiffeq/_impl/odeint.py
``_check_inputs`` tuple flattening — UNVERIFIED, see SURVEY.md §0).
"""

from __future__ import annotations

import itertools
import math
from typing import Any, Callable

import jax
import jax.numpy as jnp

__all__ = ["ravel_batched", "ravel_full"]


def ravel_batched(
    pytree: Any,
) -> tuple[jnp.ndarray, Callable[[jnp.ndarray], Any], Callable[[Any], jnp.ndarray]]:
    """Flatten a pytree whose leaves share a leading batch axis to ``(B, N)``.

    Every leaf must have shape ``(B, ...)`` with a common ``B``.  Returns
    ``(flat, unravel, flatten)``: the flat matrix; an ``unravel`` that accepts
    any array of shape ``(..., B, N)`` and rebuilds the pytree with the extra
    leading axes kept (used to unravel the ``(T, B, N)`` trajectory in one
    shot); and a ``flatten`` that maps a same-structure pytree back to
    ``(B, N)`` (used on the dynamics output inside the solver loop).
    """
    leaves, treedef = jax.tree.flatten(pytree)
    if not leaves:
        raise ValueError("empty state pytree")
    batch = leaves[0].shape[0]
    for leaf in leaves:
        if leaf.ndim < 1 or leaf.shape[0] != batch:
            raise ValueError(
                "per-sample error control requires every state leaf to have a "
                f"common leading batch axis; got shapes {[l.shape for l in leaves]}"
            )
    dtype = jnp.result_type(*leaves)
    if not jnp.issubdtype(dtype, jnp.floating):
        raise ValueError(f"state must be floating point, got {dtype}")
    shapes = [leaf.shape[1:] for leaf in leaves]
    sizes = [math.prod(s) for s in shapes]
    splits = list(itertools.accumulate(sizes))[:-1]

    flat = jnp.concatenate(
        [leaf.astype(dtype).reshape(batch, -1) for leaf in leaves], axis=1
    )

    def unravel(mat: jnp.ndarray) -> Any:
        lead = mat.shape[:-1]
        parts = jnp.split(mat, splits, axis=-1)
        rebuilt = [
            p.reshape(*lead, *shape) for p, shape in zip(parts, shapes, strict=True)
        ]
        return jax.tree.unflatten(treedef, rebuilt)

    def flatten(tree: Any) -> jnp.ndarray:
        leaves = jax.tree.leaves(tree)
        return jnp.concatenate(
            [leaf.astype(dtype).reshape(batch, -1) for leaf in leaves], axis=1
        )

    return flat, unravel, flatten


def ravel_full(
    pytree: Any,
) -> tuple[jnp.ndarray, Callable[[jnp.ndarray], Any], Callable[[Any], jnp.ndarray]]:
    """Flatten an arbitrary pytree to a single ``(1, N)`` row.

    Used for batch-global error control (torchdiffeq semantics: one error norm
    over the entire state, NFE identical for every sample in the batch).
    Returns ``(flat, unravel, flatten)``; ``unravel`` accepts ``(..., 1, N)``
    and rebuilds the pytree with leading axes kept.
    """
    leaves, treedef = jax.tree.flatten(pytree)
    if not leaves:
        raise ValueError("empty state pytree")
    dtype = jnp.result_type(*leaves)
    if not jnp.issubdtype(dtype, jnp.floating):
        raise ValueError(f"state must be floating point, got {dtype}")
    shapes = [leaf.shape for leaf in leaves]
    sizes = [math.prod(s) for s in shapes]
    splits = list(itertools.accumulate(sizes))[:-1]

    flat = jnp.concatenate(
        [leaf.astype(dtype).reshape(-1) for leaf in leaves]
    ).reshape(1, -1)

    def unravel(mat: jnp.ndarray) -> Any:
        lead = mat.shape[:-2]
        parts = jnp.split(mat[..., 0, :], splits, axis=-1)
        rebuilt = [
            p.reshape(*lead, *shape) for p, shape in zip(parts, shapes, strict=True)
        ]
        return jax.tree.unflatten(treedef, rebuilt)

    def flatten(tree: Any) -> jnp.ndarray:
        leaves = jax.tree.leaves(tree)
        return jnp.concatenate(
            [leaf.astype(dtype).reshape(-1) for leaf in leaves]
        ).reshape(1, -1)

    return flat, unravel, flatten
