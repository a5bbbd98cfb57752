"""Device mesh + sharding helpers: data parallelism over ICI.

The reference is strictly single-device (SURVEY.md §2.4); data parallelism
is a new, first-class capability of the TPU build: a 1-D ``data`` mesh over
all local chips, batches sharded along it, parameters replicated.  Gradient
all-reduce is *not* hand-written — the train step is jitted with sharding
annotations and XLA inserts the ``psum`` over ICI (scaling-book recipe:
pick a mesh, annotate, let the compiler place collectives).

The same code runs on a virtual CPU mesh
(``--xla_force_host_platform_device_count=N``) for tests and on real chips
under the driver's ``dryrun_multichip``.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_batch", "replicate", "data_sharding"]


def make_mesh(num_devices: int | None = None, *, axis: str = "data") -> Mesh:
    """1-D data-parallel mesh over the first ``num_devices`` local devices."""
    devices = jax.devices()
    if num_devices is not None:
        if num_devices > len(devices):
            raise ValueError(
                f"requested {num_devices} devices, have {len(devices)}"
            )
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis,))


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
