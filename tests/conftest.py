"""Test configuration: run everything on a virtual 8-device CPU mesh.

Mirrors SURVEY.md §4 item 6: multi-chip sharding is validated without TPU
hardware via ``xla_force_host_platform_device_count``.  x64 is enabled so the
solver accuracy/convergence tests can use tight float64 bounds (the solver is
dtype-generic; TPU runs use f32/bf16).

NOTE on this machine: an ``axon`` sitecustomize force-registers the remote
TPU backend at interpreter start and overrides ``JAX_PLATFORMS`` from the
environment, so the only reliable way to pin tests to CPU is
``jax.config.update('jax_platforms', 'cpu')`` *after* importing jax.  The
``XLA_FLAGS`` device-count flag still works because the CPU client is created
lazily on first use.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
