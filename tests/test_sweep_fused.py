"""sweep.py --fused: the vmapped-over-rtol single-dispatch sweep must
reproduce the per-tol sweep's accuracy and NFE exactly (rtol enters the
adaptive controller as plain arithmetic, so tracing it cannot change the
accept/reject sequence)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import sweep


def test_fused_sweep_matches_per_tol(tmp_path):
    common = ["--dataset", "synthetic-cifar10", "--limit", "128",
              "--batch-size", "64", "--tols", "1e-1,1e-2"]
    rows_f = sweep.main(["--fused", *common,
                         "--output", str(tmp_path / "f.csv")])
    rows_u = sweep.main([*common, "--output", str(tmp_path / "u.csv")])
    assert len(rows_f) == len(rows_u) == 2
    for f, u in zip(rows_f, rows_u):
        assert f["tol"] == u["tol"]
        assert abs(f["top1"] - u["top1"]) < 1e-6
        assert abs(f["nfe_mean"] - u["nfe_mean"]) < 0.51
        assert f["nfe_min"] == u["nfe_min"]
        assert f["nfe_max"] == u["nfe_max"]
        assert f["sweep_s"] > 0 and "ips" not in f


def test_fused_sweep_speed_only(tmp_path):
    rows = sweep.main(["--fused", "--tols", "1e-1,1e-2", "--batch-size",
                       "16", "--iters", "2",
                       "--output", str(tmp_path / "s.csv")])
    assert [r["tol"] for r in rows] == [1e-1, 1e-2]
    # Tighter tolerance must cost at least as many dynamics evals.
    assert rows[1]["nfe_mean"] >= rows[0]["nfe_mean"]


def test_random_init_sweep_one_channel_dataset(tmp_path):
    # Regression: random-init + 1-channel dataset used to crash (stem was
    # always built at 3 input channels).
    rows = sweep.main(["--fused", "--dataset", "synthetic-mnist", "--limit",
                       "64", "--batch-size", "32", "--tols", "1e-1",
                       "--output", str(tmp_path / "m.csv")])
    assert 0.0 <= rows[0]["top1"] <= 1.0
