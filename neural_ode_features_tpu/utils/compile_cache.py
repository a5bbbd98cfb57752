"""Persistent XLA compile-cache enablement with the mandatory safety gates.

reference: (no counterpart — deployment-environment tooling for this
framework; the reference is a single-process torch codebase with no
compile cache.)

This is the ONE place the cache may be turned on (CLAUDE.md rule).  The
gates are not optional tuning: XLA:CPU AOT cache entries are
machine-feature-specific — round 4 caught the shared ``.jax_cache/``
serving ``jit__uniform`` CPU executables compiled with
``+prefer-no-scatter/+prefer-no-gather`` to a host without those features
(``cpu_aot_loader`` warning; SIGILL class on a worse day).  Even a
TPU-primary process compiles small host-side programs on XLA:CPU, and JAX
0.9 has no per-backend cache filter, so every enablement site must gate by
size + compile time: every CPU-compiled program this codebase makes is
KB-sized and sub-second, every TPU program worth caching is neither.
"""

from __future__ import annotations

import os

# Repo-local cache shared by bench/export/eval/probes; verified working
# cross-process on axon (12 s compile -> 0.2 s reload, RESULTS.md r3).
DEFAULT_CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")

# Entry gates (see module docstring).  Exported so tests can assert the
# call sites never drift below them.
MIN_COMPILE_TIME_SECS = 5.0
MIN_ENTRY_SIZE_BYTES = 100_000


def enable_tpu_compile_cache(cache_dir: str | None = None,
                             cpu: bool = False) -> bool:
    """Enable the persistent compile cache iff this process targets the TPU.

    Call AFTER ``import jax`` and BEFORE the first compilation.  Returns
    True iff the cache was enabled.  Refuses (returns False) when:

    - ``cpu=True`` — the caller is about to pin XLA:CPU (pass the CLI's
      ``--cpu`` here; the pin itself often happens after this call), or
    - the process is already CPU-primary (``jax_platforms`` primary entry
      is ``cpu`` — e.g. the test suite's conftest pin).  Axon's
      sitecustomize sets ``'axon,cpu'``; only the PRIMARY platform counts
      (CLAUDE.md: never detect a pin by substring).

    Never raises: an unavailable cache degrades to cold compiles.
    """
    if cpu:
        return False
    try:
        import jax

        platforms = str(getattr(jax.config, "jax_platforms", None) or "")
        primary = platforms.split(",")[0].strip()
        if primary == "cpu":
            return False
        if not primary and jax.default_backend() == "cpu":
            # jax_platforms unset (no axon sitecustomize, no pin): on a
            # CPU-only host the default backend IS XLA:CPU, and enabling
            # the cache there writes machine-feature-specific AOT entries
            # into the shared dir — the cross-host SIGILL class the gates
            # exist to prevent (code-review r4).  default_backend() is
            # only consulted when nothing is pinned: calling it
            # initializes backends, which an explicit pin makes moot.
            return False
        path = cache_dir or DEFAULT_CACHE_DIR
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          MIN_COMPILE_TIME_SECS)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes",
                          MIN_ENTRY_SIZE_BYTES)
        return True
    except Exception:
        return False
