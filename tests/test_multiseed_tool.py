"""tools/multiseed.py plumbing: the --population runner must parse the
per-seed run-dir banners train.py emits and fail loudly on gaps (the
campaign's resumability depends on per-seed records landing correctly)."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import tools.multiseed as ms


class _Proc:
    def __init__(self, rc, stdout):
        self.returncode = rc
        self.stdout = stdout
        self.stderr = ""


def test_population_banner_parsing(monkeypatch, tmp_path):
    stdout = (
        f"run dir (seed 0): {tmp_path}/a\n"
        "train 128 / test 128 images; 4 steps/epoch\n"
        f"run dir (seed 7): {tmp_path}/b\n"
        "seed 0 | epoch=0 | ...\n"
    )
    seen = {}

    def fake_run(cmd, **kw):
        seen["cmd"] = cmd
        return _Proc(0, stdout)

    monkeypatch.setattr(ms.subprocess, "run", fake_run)
    dirs = ms._run_train_population(["--epochs", "1"], [0, 7], tmp_path)
    assert dirs == {0: Path(f"{tmp_path}/a"), 7: Path(f"{tmp_path}/b")}
    # The CLI got one --seeds covering both members.
    i = seen["cmd"].index("--seeds")
    assert seen["cmd"][i + 1] == "0,7"


def test_population_missing_seed_raises(monkeypatch, tmp_path):
    stdout = f"run dir (seed 0): {tmp_path}/a\n"
    monkeypatch.setattr(
        ms.subprocess, "run", lambda cmd, **kw: _Proc(0, stdout)
    )
    with pytest.raises(RuntimeError, match=r"missing for seeds \[1\]"):
        ms._run_train_population([], [0, 1], tmp_path)


def test_population_nonzero_rc_raises(monkeypatch, tmp_path):
    monkeypatch.setattr(
        ms.subprocess, "run", lambda cmd, **kw: _Proc(3, "boom")
    )
    with pytest.raises(RuntimeError, match="rc=3"):
        ms._run_train_population([], [0], tmp_path)
