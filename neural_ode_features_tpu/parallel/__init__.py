"""Parallelism: device meshes and sharding helpers (SURVEY.md §2.4)."""

from .mesh import (
    data_sharding,
    make_mesh,
    param_shardings,
    param_spec,
    population_sharding,
    population_shardings,
    replicate,
    shard_batch,
)

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
