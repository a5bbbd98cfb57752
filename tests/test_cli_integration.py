"""End-to-end CLI integration: train → extract → evaluate → sweep, in-process
on tiny synthetic data (the reference's public surface, SURVEY.md §3)."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


@pytest.mark.slow
def test_cli_pipeline(tmp_path):
    import evaluate as evaluate_cli
    import extract as extract_cli
    import sweep as sweep_cli
    import train as train_cli

    runs = tmp_path / "runs"
    run_dir = train_cli.main([
        "--dataset", "synthetic-mnist", "--epochs", "1", "--limit", "96",
        "--batch-size", "32", "--tol", "1e-2", "--lr", "0.05",
        "--runs-dir", str(runs),
    ])
    assert (run_dir / "ckpt_best.msgpack").exists()
    assert (run_dir / "log.csv").exists()

    h5 = extract_cli.main([
        "--run", str(run_dir), "--timestamps", "3", "--limit", "64",
        "--batch-size", "32",
    ])
    assert h5.exists()
    import h5py

    with h5py.File(h5) as f:
        assert f["features"].shape[0] == 3
        assert np.all(np.asarray(f["nfe"]) > 0)

    # --fused (whole split in ONE dispatch) must reproduce the per-batch
    # extraction exactly.
    h5_f = extract_cli.main([
        "--run", str(run_dir), "--timestamps", "3", "--limit", "64",
        "--batch-size", "32", "--fused",
        "--output", str(tmp_path / "fused.h5"),
    ])
    with h5py.File(h5) as a, h5py.File(h5_f) as b:
        np.testing.assert_array_equal(a["nfe"][:], b["nfe"][:])
        np.testing.assert_allclose(a["features"][:], b["features"][:],
                                   rtol=1e-6, atol=1e-7)

    csv_path = evaluate_cli.main([
        "--features", str(h5), "--limit", "60", "--metrics", "map",
    ])
    assert csv_path.exists()
    rows = csv_path.read_text().strip().splitlines()
    assert rows[0].startswith("t,") and len(rows) == 4

    sweep_rows = sweep_cli.main([
        "--run", str(run_dir), "--dataset", "synthetic-mnist",
        "--limit", "64", "--tols", "1e-2", "--batch-size", "32",
        "--output", str(tmp_path / "sweep.csv"),
    ])
    assert sweep_rows[0]["nfe_mean"] > 5
    assert 0.0 <= sweep_rows[0]["top1"] <= 1.0


def test_evaluate_plot(tmp_path):
    """--plot writes a PNG next to the CSV (the papers' metric-vs-t curve)."""
    from evaluate import _plot_metrics

    rows = [{"t": 0.0, "linear_acc": 0.5, "retrieval_map": 0.3},
            {"t": 1.0, "linear_acc": 0.9, "retrieval_map": 0.7}]
    out = tmp_path / "m.png"
    _plot_metrics(rows, out)
    assert out.exists() and out.stat().st_size > 5_000
