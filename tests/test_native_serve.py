"""Native serving host (native/pjrt_serve) — build + CLI contract.

The CPU suite cannot exercise the C++ PJRT execute path end-to-end: jaxlib
ships no CPU PJRT C-API plugin ``.so`` (the CPU client is linked into
``_jax.so`` without a ``GetPjrtApi`` export), and the axon TPU plugin needs
the real tunnel.  Hardware verification lives in
``probes/native_serve_probe.sh`` (committed log: the --selftest parity run
on the v5e).  What this test pins:

  * the runner builds from source with the in-image toolchain;
  * argument/contract errors exit non-zero BEFORE touching the plugin
    (a serving box misconfiguration must fail fast, not hang on a claim);
  * the .npy reader rejects non-f32 input with a clear message.

reference: none — SURVEY.md §2.3 (the reference has no native layer; the
serving host EXCEEDS parity).
"""

import pathlib
import subprocess

import numpy as np
import pytest

ROOT = pathlib.Path(__file__).resolve().parent.parent
NATIVE = ROOT / "native"
TF_INC = None
try:
    import tensorflow  # noqa: F401

    TF_INC = (
        pathlib.Path(tensorflow.__file__).parent / "include"
    )
except Exception:  # pragma: no cover - tensorflow always in this image
    pass


@pytest.fixture(scope="module")
def binary():
    if TF_INC is None or not TF_INC.exists():
        pytest.skip("tensorflow include tree (PJRT header) not available")
    # -B: force the compile — a fresh checkout can give source and a stale
    # binary equal mtimes, and this test must prove the CURRENT source
    # builds.
    subprocess.run(
        ["make", "-B", f"TF_INC={TF_INC}"], cwd=NATIVE, check=True,
        capture_output=True, text=True, timeout=300,
    )
    return NATIVE / "pjrt_serve"


def test_builds(binary):
    assert binary.exists() and binary.stat().st_size > 0


def test_usage_error_fails_fast(binary):
    p = subprocess.run([str(binary)], capture_output=True, text=True,
                       timeout=60)
    assert p.returncode != 0
    assert "usage:" in (p.stdout + p.stderr)


def test_missing_artifact_fails_before_plugin(binary, tmp_path):
    # Point at a bogus plugin path AND a missing artifact: artifact
    # validation runs first (fail-fast contract), so the error must be the
    # artifact's — never a dlopen attempt or a session claim.
    p = subprocess.run(
        [str(binary), str(tmp_path / "nope.npexec"),
         "--plugin", str(tmp_path / "no_plugin.so")],
        capture_output=True, text=True, timeout=60,
    )
    assert p.returncode != 0
    out = p.stdout + p.stderr
    assert "cannot open" in out
    assert "dlopen" not in out


def test_artifact_validation_precedes_session(binary, tmp_path):
    # Artifact checks run before ANY plugin/session work (the runner's
    # fail-fast contract), so these complete in milliseconds without a
    # TPU claim even on a box with the real plugin installed.
    art = tmp_path / "a.npexec"
    art.mkdir()
    # 1. missing executable.bin
    np.save(art / "sample_input.npy", np.zeros((2, 2), np.float32))
    p = subprocess.run([str(binary), str(art)], capture_output=True,
                       text=True, timeout=60)
    assert p.returncode != 0
    assert "cannot open" in (p.stdout + p.stderr)
    # 2. non-f32 input
    (art / "executable.bin").write_bytes(b"not-a-real-executable")
    np.save(art / "sample_input.npy", np.zeros((2, 2), np.float64))
    p = subprocess.run([str(binary), str(art)], capture_output=True,
                       text=True, timeout=60)
    assert p.returncode != 0
    assert "only <f4" in (p.stdout + p.stderr)
