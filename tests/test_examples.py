"""The examples/ demos actually run (VERDICT r4 #4).

One subprocess smoke per example script: rc=0 plus its signature output
line.  The examples are the runnable face of the framework cited from the
docs — without these tests they rot silently with the next API change.
Subprocess isolation also keeps their heavy multi-axis compiles
(fsdp_training's 4×2 mesh) out of this interpreter per the XLA:CPU
segfault rule (CLAUDE.md).
"""

import subprocess
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parent.parent
EXAMPLES = ROOT / "examples"

pytestmark = pytest.mark.slow


def run_example(name, *args, timeout=900):
    proc = subprocess.run(
        [sys.executable, str(EXAMPLES / name), *args],
        capture_output=True,
        text=True,
        timeout=timeout,
        cwd=ROOT,
    )
    assert proc.returncode == 0, (
        f"{name} failed (rc={proc.returncode})\n"
        f"--- stdout ---\n{proc.stdout}\n--- stderr ---\n{proc.stderr}"
    )
    return proc.stdout


def test_solver_playground():
    out = run_example("solver_playground.py", "--cpu")
    assert "per-sample NFE" in out
    assert "fitted damping:" in out


def test_continuous_features():
    out = run_example("continuous_features.py", "--cpu")
    assert "retrieval mAP=" in out
    assert "from one solve" in out


def test_deploy_artifact():
    out = run_example("deploy_artifact.py", "--cpu")
    assert "OK: the artifact serves the model with zero framework code" in out


def test_fsdp_training():
    out = run_example("fsdp_training.py")
    assert "mesh: {'data': 4, 'model': 2}" in out
    assert "OK — same state across topologies" in out


def test_native_serving():
    out = run_example("native_serving.py")
    assert "server shut down cleanly" in out
    assert "pipelined stream:" in out
