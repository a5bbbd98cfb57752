"""bench.py capture hardening (VERDICT r2 #1/#4/#5): the driver's single
most important artifact must be a parseable JSON line on EVERY exit path —
complete on a healthy run, partial + ``incomplete: true`` when the TPU
tunnel stalls past the deadline."""

import json
import os
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def _run_bench(extra_args, env_extra, timeout=240):
    env = dict(os.environ, **env_extra)
    proc = subprocess.run(
        [sys.executable, str(ROOT / "bench.py"), "--cpu", *extra_args],
        cwd=str(ROOT), env=env, capture_output=True, text=True,
        timeout=timeout,
    )
    lines = [ln for ln in proc.stdout.splitlines() if ln.strip().startswith("{")]
    assert lines, (
        f"no JSON line on stdout (rc={proc.returncode}):\n"
        f"{proc.stdout[-1500:]}\n{proc.stderr[-1500:]}"
    )
    return json.loads(lines[-1]), proc


def test_complete_run_json_contract():
    result, proc = _run_bench(
        ["--iters", "2", "--repeats", "2", "--tol", "1e-2",
         "--batch-size", "32", "--cpu-batches", "2"],
        {"BENCH_DEADLINE_S": "200"},
    )
    assert proc.returncode == 0
    # Driver contract: metric/value/unit/vs_baseline; hardening additions:
    # median + band + repeats + baseline diagnostics.
    assert result["unit"] == "img/s/chip"
    assert result["value"] > 0
    # Round-4 semantics: value IS the median; best-of lives in value_best.
    assert result["value_band"][0] <= result["value"] <= result["value_best"]
    assert result["value_best"] == result["value_band"][1]
    assert result["repeats"] == 2
    assert not result.get("incomplete")
    assert result["cpu_ips"] and result["cpu_ips_spread"]
    assert len(result["host_load_1min"]) == 2


def test_deadline_emits_partial_json():
    """A deadline far below the runtime must still yield a parseable line
    flagged incomplete (round 2's BENCH_r02.json was rc=124/parsed=null)."""
    result, proc = _run_bench(
        ["--iters", "64", "--repeats", "30", "--tol", "1e-5",
         "--batch-size", "256", "--cpu-batches", "2"],
        {"BENCH_DEADLINE_S": "25"},
        timeout=120,
    )
    assert proc.returncode == 0
    assert result.get("incomplete") is True
    assert "stage" in result


def test_inner_direct_invocation_still_works():
    """BENCH_NO_SUPERVISOR=1 runs the measurement in-process (no child) —
    the escape hatch when subprocess spawning is undesirable."""
    result, proc = _run_bench(
        ["--iters", "2", "--repeats", "2", "--tol", "1e-2",
         "--batch-size", "32", "--skip-baseline"],
        {"BENCH_NO_SUPERVISOR": "1"},
    )
    assert proc.returncode == 0
    assert result["value"] > 0
    assert result["vs_baseline"] is None
