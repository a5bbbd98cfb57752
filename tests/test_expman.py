"""Experiment-manager contracts (utils/expman.py).

Pins the run-dir naming guarantees VERDICT r2 flagged: names must stay
safely under the 255-byte filename limit on every filesystem, and the
digest-truncation path must keep DISTINCT experiments in DISTINCT
directories (a silent cross-resume corrupts both runs).
reference: expman submodule / pip dep — UNVERIFIED (SURVEY.md §2.1).
"""

import json
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from neural_ode_features_tpu.utils.expman import Experiment

# Core-correctness fast tier (pytest -m fast, VERDICT r4 #5).
pytestmark = pytest.mark.fast

WIDE = {f"flag_number_{i}": i * 0.5 for i in range(40)}  # very long name


def test_name_is_deterministic_and_order_free():
    a = Experiment.name_from_params({"lr": 0.1, "seed": 3, "tol": 1e-3})
    b = Experiment.name_from_params({"tol": 1e-3, "seed": 3, "lr": 0.1})
    assert a == b
    assert "lr_0.1" in a and "seed_3" in a


def test_name_never_exceeds_filename_limit():
    name = Experiment.name_from_params(WIDE)
    assert len(name.encode()) < 255  # ext4/tmpfs filename cap
    assert len(name) <= 200


def test_truncated_names_do_not_collide():
    # Two experiments identical except for a flag that lands in the
    # truncated tail must still map to different directories.
    p1 = dict(WIDE, zzz_seed=0)
    p2 = dict(WIDE, zzz_seed=1)
    n1 = Experiment.name_from_params(p1)
    n2 = Experiment.name_from_params(p2)
    assert len(n1) == len(n2) <= 200
    assert n1 != n2
    assert n1[:50] == n2[:50]  # same prefix: truncation really happened


def test_resume_same_params_refuse_different(tmp_path):
    params = {"lr": 0.1, "seed": 3}
    e1 = Experiment(tmp_path, params).create()
    assert (e1.path / "params.json").exists()
    # Same params: resumes the same dir.
    e2 = Experiment(tmp_path, params).create()
    assert e2.path == e1.path
    # Different params forced into the SAME dir name: must refuse.
    with pytest.raises(ValueError, match="DIFFERENT experiment"):
        Experiment(tmp_path, {"lr": 0.2, "seed": 4}, name=e1.name).create()
    saved = json.loads((e1.path / "params.json").read_text())
    assert saved["lr"] == 0.1


def test_log_schema_enforced(tmp_path):
    """A row whose keys differ from the existing header must be refused —
    it used to append misaligned values silently (code-review r4)."""
    e = Experiment(tmp_path, {"lr": 0.1}).create()
    e.log({"epoch": 0, "loss": 1.5})
    with pytest.raises(ValueError, match="schema mismatch"):
        e.log({"epoch": 1, "loss": 1.2, "val_acc": 0.3})
    # Matching schema still appends (incl. after reopening the run dir).
    e.log({"epoch": 1, "loss": 1.2})
    assert [r["loss"] for r in e.read_log()] == ["1.5", "1.2"]
