"""The persistent compile cache may be enabled in exactly one place.

XLA:CPU AOT cache entries are machine-feature-specific (SIGILL class on a
cross-host reload — the round-4 ``jit__uniform`` incident, RESULTS.md), and
even TPU-primary processes compile small host programs on XLA:CPU, so every
enablement must carry the size + compile-time gates.  Instead of trusting
copy-discipline at each site (code-review r4 found four probe scripts that
had drifted), the invariant is structural: the only file allowed to touch
``jax_compilation_cache_dir`` is ``utils/compile_cache.py``, and the gates
it applies must never weaken.
"""

import pathlib

from neural_ode_features_tpu.utils import compile_cache

ROOT = pathlib.Path(__file__).resolve().parents[1]

ALLOWED = {ROOT / "neural_ode_features_tpu" / "utils" / "compile_cache.py"}

SCAN_DIRS = ["neural_ode_features_tpu", "tools", "probes", "tests",
             "examples"]
TOP_LEVEL = ["bench.py", "train.py", "extract.py", "evaluate.py", "sweep.py",
             "__graft_entry__.py"]


def _py_files():
    for d in SCAN_DIRS:
        yield from (ROOT / d).rglob("*.py")
    for f in TOP_LEVEL:
        p = ROOT / f
        if p.exists():
            yield p


def test_single_enablement_site():
    offenders = [
        str(p.relative_to(ROOT))
        for p in _py_files()
        if p not in ALLOWED
        and "jax_compilation_cache_dir" in p.read_text(errors="ignore")
        and p != pathlib.Path(__file__).resolve()
    ]
    assert not offenders, (
        "persistent-cache enablement outside utils/compile_cache.py "
        f"(use enable_tpu_compile_cache): {offenders}")


def test_gates_never_weaken():
    assert compile_cache.MIN_COMPILE_TIME_SECS >= 5.0
    assert compile_cache.MIN_ENTRY_SIZE_BYTES >= 100_000


def test_refuses_cpu_pinned_process():
    # The suite's conftest pins jax_platforms to exactly "cpu", so the
    # helper must refuse here both via the flag and via platform detection.
    assert compile_cache.enable_tpu_compile_cache(cpu=True) is False
    assert compile_cache.enable_tpu_compile_cache() is False


def test_refuses_cpu_only_host_with_unset_platforms():
    """jax_platforms unset (no axon sitecustomize, no pin) on a CPU-only
    host: the helper must consult the default backend and refuse — enabling
    there writes machine-feature-specific XLA:CPU AOT entries into the
    shared cache (cross-host SIGILL class, code-review r4)."""
    import unittest.mock as mock

    import jax

    with mock.patch.object(type(jax.config), "jax_platforms",
                           new_callable=mock.PropertyMock,
                           return_value=None, create=True):
        assert compile_cache.enable_tpu_compile_cache() is False
