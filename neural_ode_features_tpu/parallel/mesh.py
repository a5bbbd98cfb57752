"""Device mesh + sharding helpers: data + model parallelism over ICI.

reference: none (the reference is strictly single-device — SURVEY.md §2.4);
parallelism is a new, first-class capability of the TPU build:

* **Data parallelism** — a ``data`` mesh axis over local chips, batches
  sharded along it, gradients all-reduced.  The all-reduce is *not*
  hand-written: the train step is jitted with sharding annotations and XLA
  inserts the ``psum`` over ICI (scaling-book recipe: pick a mesh,
  annotate, let the compiler place collectives).
* **Parameter sharding (FSDP / ZeRO-3 style)** — an optional second
  ``model`` mesh axis over which every parameter and optimizer-state leaf
  is sharded along its largest divisible dimension
  (:func:`param_shardings`).  GSPMD all-gathers each weight where the
  compute consumes it and reduce-scatters its gradient, so per-chip
  parameter + optimizer memory drops by the ``model`` axis size with no
  model-code changes.  (This workload's 0.22 M params don't *need* it —
  SURVEY.md §2.4 marks TP "skip" — but the framework supports wide model
  variants, and the mechanism is exactly how large models shard on TPU.)

The same code runs on a virtual CPU mesh
(``--xla_force_host_platform_device_count=N``) for tests and on real chips
under the driver's ``dryrun_multichip``.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "shard_batch",
    "replicate",
    "data_sharding",
    "param_spec",
    "param_shardings",
    "population_sharding",
    "population_shardings",
]


def make_mesh(
    num_devices: int | None = None,
    *,
    axis: str = "data",
    model_size: int = 1,
    model_axis: str = "model",
) -> Mesh:
    """Mesh over the first ``num_devices`` local devices.

    ``model_size == 1`` (default) gives the classic 1-D data-parallel mesh.
    ``model_size > 1`` gives a 2-D ``(data, model)`` mesh: the batch axis
    shards over ``data`` and parameters shard over ``model`` (see
    :func:`param_shardings`).  Adjacent device IDs land on the ``model``
    axis, which on real slices keeps the (more frequent) parameter
    all-gather/reduce-scatter traffic on the shortest ICI hops.
    """
    devices = jax.devices()
    if num_devices is not None:
        if num_devices > len(devices):
            raise ValueError(
                f"requested {num_devices} devices, have {len(devices)}"
            )
        devices = devices[:num_devices]
    if model_size <= 1:
        return Mesh(np.asarray(devices), (axis,))
    if len(devices) % model_size:
        raise ValueError(
            f"model_size {model_size} does not divide {len(devices)} devices"
        )
    grid = np.asarray(devices).reshape(len(devices) // model_size, model_size)
    return Mesh(grid, (axis, model_axis))


def param_spec(
    shape: tuple[int, ...], shards: int, axis: str = "model"
) -> P:
    """FSDP sharding rule for one parameter/optimizer leaf: shard the
    largest dimension divisible by ``shards`` (ties → the trailing one, so
    conv HWIO kernels shard output channels); replicate anything that has
    no divisible dimension (scalars, odd shapes)."""
    if shards <= 1 or not shape:
        return P()
    best = None
    for d, size in enumerate(shape):
        if size % shards == 0 and size >= shards:
            if best is None or size >= shape[best]:
                best = d
    if best is None:
        return P()
    spec = [None] * len(shape)
    spec[best] = axis
    return P(*spec)


def param_shardings(mesh: Mesh, tree, *, axis: str = "model"):
    """Pytree of :class:`NamedSharding` implementing FSDP parameter
    sharding over the mesh's ``model`` axis (replicated everywhere if the
    mesh has no such axis).  Shape-based, so the same function shards the
    params pytree and any params-shaped optimizer state."""
    if axis not in mesh.axis_names or mesh.shape[axis] == 1:
        rep = NamedSharding(mesh, P())
        return jax.tree.map(lambda _: rep, tree)
    shards = mesh.shape[axis]
    return jax.tree.map(
        lambda leaf: NamedSharding(
            mesh, param_spec(np.shape(leaf), shards, axis)
        ),
        tree,
    )


def population_sharding(
    mesh: Mesh, population: int, *, axis: str = "data"
) -> NamedSharding:
    """Sharding for ONE leaf whose leading axis is a population (seed)
    axis: shard it over the mesh's ``data`` axis when the size divides,
    replicate otherwise (still correct — every member just runs on every
    device)."""
    if axis in mesh.axis_names and population % mesh.shape[axis] == 0:
        return NamedSharding(mesh, P(axis))
    return NamedSharding(mesh, P())


def population_shardings(
    mesh: Mesh, tree, population: int, *, axis: str = "data"
):
    """Shardings for a *population* pytree: every leaf carries a leading
    seed/member axis of size ``population`` (see ``multi.PopulationTrainer``).

    The population axis shards over the mesh's ``data`` axis when it
    divides — each device then trains ``population / data`` complete,
    independent models with ZERO inter-chip communication (the
    embarrassingly-parallel mapping; gradients never cross members)."""
    sh = population_sharding(mesh, population, axis=axis)
    return jax.tree.map(lambda _: sh, tree)


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis."""
    return NamedSharding(mesh, P(axis))


def replicate(mesh: Mesh):
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, *arrays, axis: str = "data") -> tuple:
    """Device-put host arrays with the batch axis sharded over the mesh.
    Always returns a tuple (even for one array) — arity-dependent return
    shapes are a footgun."""
    sh = data_sharding(mesh, axis)
    return tuple(jax.device_put(a, sh) for a in arrays)
