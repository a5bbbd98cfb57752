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


def test_evaluate_rejects_mismatched_train_tgrid(tmp_path):
    """evaluate.py pairs train/test features by index, so differing t-grids
    must be refused up front (code-review r4: it silently trained the probe
    at one t and tested at another)."""
    import h5py

    import evaluate as evaluate_cli

    def write(path, n_t):
        ts = np.linspace(0, 1, n_t).astype(np.float32)
        with h5py.File(path, "w") as f:
            f["t"] = ts
            f["features"] = np.random.default_rng(0).normal(
                size=(n_t, 20, 4)).astype(np.float32)
            f["labels"] = np.arange(20, dtype=np.int32) % 2

    test_h5 = tmp_path / "test.h5"
    train_h5 = tmp_path / "train.h5"
    write(test_h5, 3)
    write(train_h5, 5)
    with pytest.raises(SystemExit, match="t-grid"):
        evaluate_cli.main([
            "--features", str(test_h5),
            "--train-features", str(train_h5),
            "--metrics", "linear",
        ])


def test_evaluate_rejects_unknown_metric(tmp_path):
    """An unrecognized --metrics token used to be a silent no-op: every row
    printed with no metric columns and 'best t' degenerated to the first row
    (code-review r4, found live with --metrics probe)."""
    import h5py

    import evaluate as evaluate_cli

    h5 = tmp_path / "f.h5"
    with h5py.File(h5, "w") as f:
        f["t"] = np.linspace(0, 1, 3).astype(np.float32)
        f["features"] = np.random.default_rng(0).normal(
            size=(3, 20, 4)).astype(np.float32)
        f["labels"] = np.arange(20, dtype=np.int32) % 2
    with pytest.raises(SystemExit, match="unknown metric"):
        evaluate_cli.main(["--features", str(h5), "--metrics", "probe"])


def test_evaluate_plot(tmp_path):
    """--plot writes a PNG next to the CSV (the papers' metric-vs-t curve)."""
    from evaluate import _plot_metrics

    rows = [{"t": 0.0, "linear_acc": 0.5, "retrieval_map": 0.3},
            {"t": 1.0, "linear_acc": 0.9, "retrieval_map": 0.7}]
    out = tmp_path / "m.png"
    _plot_metrics(rows, out)
    assert out.exists() and out.stat().st_size > 5_000
