#!/usr/bin/env python
"""Turnkey reference-protocol runner (VERDICT r2 #7, SURVEY.md §4 item 7).

The day real MNIST/CIFAR-10 files appear under ``./data`` (zero-egress box:
they must be placed manually), ONE command runs the full reference
training protocol and emits the parity verdict:

    python tools/reference_protocol.py --dataset mnist
    python tools/reference_protocol.py --dataset cifar10

Pipeline per dataset, at the reference hyperparameters (SGD 0.1, batch 128,
160 epochs, decay 60/100/140, tol 1e-3, adjoint — train.py's defaults,
reference: train.py argparse — UNVERIFIED):

  1. detect real files (loaders: data/datasets.py; raises with placement
     instructions when absent),
  2. train.py (resumable — rerunning continues the same expman run dir),
  3. tools/eval_ckpt.py at tol 1e-3 → final test top-1,
  4. tools/parity_eval.py → jax-vs-torch-oracle top-1 agreement on
     identical weights (the executable half of the ±0.2% clause without
     the reference repo),
  5. verdict JSON → stdout + ``runs_protocol/<dataset>_verdict.json``:
     MNIST target ≥ 0.993 (SURVEY §4.7), CIFAR-10 budget ±0.2% vs the
     torch-oracle execution model.

``--fabricate`` writes real-FORMAT files generated from the synthetic
twins into ``--data-dir`` first (IDX / pickle batches — the same writers
tests/test_real_loaders.py validates), so the entire pipeline is
exercisable end-to-end today; the verdict is then labelled
``data: fabricated`` (accuracy targets apply only to real data).
``--smoke`` shrinks epochs/limit for a minutes-long CI pass.
"""

from __future__ import annotations

import argparse
import gzip
import json
import pickle
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

TARGETS = {"mnist": 0.993, "cifar10": None}  # cifar: ±0.2% parity clause


# ---------------------------------------------------------------------------
# Real-format fabrication from the synthetic twins
# ---------------------------------------------------------------------------

def _write_idx_images(path: Path, arr) -> None:
    import numpy as np

    with open(path, "wb") as f:
        f.write((2051).to_bytes(4, "big"))
        for d in arr.shape:
            f.write(int(d).to_bytes(4, "big"))
        f.write(np.ascontiguousarray(arr, np.uint8).tobytes())


def _write_idx_labels(path: Path, arr, gz: bool = False) -> None:
    import numpy as np

    raw = ((2049).to_bytes(4, "big") + int(arr.shape[0]).to_bytes(4, "big")
           + np.ascontiguousarray(arr, np.uint8).tobytes())
    if gz:
        with gzip.open(path, "wb") as f:
            f.write(raw)
    else:
        path.write_bytes(raw)


def fabricate(dataset: str, data_dir: Path, limit: int | None) -> None:
    """Write real-format files from the synthetic twins (exercise path)."""
    import numpy as np

    sys.path.insert(0, str(ROOT))
    from neural_ode_features_tpu.data import load_dataset

    if dataset == "mnist":
        root = data_dir / "mnist"
        root.mkdir(parents=True, exist_ok=True)
        for split, prefix in (("train", "train"), ("test", "t10k")):
            x, y = load_dataset("synthetic-mnist", split, limit=limit)
            _write_idx_images(root / f"{prefix}-images-idx3-ubyte",
                              x[..., 0])
            _write_idx_labels(root / f"{prefix}-labels-idx1-ubyte", y)
    else:
        root = data_dir / "cifar-10-batches-py"
        root.mkdir(parents=True, exist_ok=True)
        x, y = load_dataset("synthetic-cifar10", "train", limit=limit)
        n = len(x) // 5
        for i in range(5):
            xi = x[i * n:(i + 1) * n]
            batch = {
                b"data": np.ascontiguousarray(
                    xi.transpose(0, 3, 1, 2).reshape(len(xi), -1), np.uint8),
                b"labels": [int(v) for v in y[i * n:(i + 1) * n]],
            }
            with open(root / f"data_batch_{i + 1}", "wb") as f:
                pickle.dump(batch, f)
        xt, yt = load_dataset("synthetic-cifar10", "test", limit=limit)
        with open(root / "test_batch", "wb") as f:
            pickle.dump({
                b"data": np.ascontiguousarray(
                    xt.transpose(0, 3, 1, 2).reshape(len(xt), -1), np.uint8),
                b"labels": [int(v) for v in yt],
            }, f)
    print(f"[protocol] fabricated real-format {dataset} under {root}",
          flush=True)


# ---------------------------------------------------------------------------
# Pipeline
# ---------------------------------------------------------------------------

def _sub(cmd: list[str], timeout: int) -> subprocess.CompletedProcess:
    print(f"[protocol] $ {' '.join(cmd)}", flush=True)
    proc = subprocess.run(cmd, cwd=str(ROOT), capture_output=True, text=True,
                          timeout=timeout, start_new_session=True)
    if proc.returncode != 0:
        raise RuntimeError(
            f"step failed rc={proc.returncode}:\n{proc.stdout[-1500:]}\n"
            f"{proc.stderr[-1500:]}")
    return proc


def _last_json(stdout: str) -> dict:
    for line in reversed(stdout.splitlines()):
        if line.strip().startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no JSON line in output:\n{stdout[-800:]}")


def run_protocol(dataset: str, data_dir: Path, *, epochs: int,
                 limit: int | None, cpu: bool, fabricated: bool) -> dict:
    t_start = time.time()

    # 1. detection — loaders raise with placement instructions if absent
    sys.path.insert(0, str(ROOT))
    from neural_ode_features_tpu.data import load_dataset

    load_dataset(dataset, "test", str(data_dir), limit=8)

    # 2. train at reference hyperparameters (decay epochs scaled if the
    # epoch count was overridden)
    decay = ("60,100,140" if epochs == 160 else
             ",".join(str(max(1, int(epochs * f))) for f in (.375, .625, .875)))
    train_cmd = [sys.executable, str(ROOT / "train.py"),
                 "--dataset", dataset, "--epochs", str(epochs),
                 "--lr-decay-epochs", decay, "--tol", "1e-3",
                 "--data-dir", str(data_dir),
                 "--runs-dir", str(ROOT / "runs_protocol")]
    if limit:
        train_cmd += ["--limit", str(limit)]
    if cpu:
        train_cmd += ["--cpu"]
    proc = _sub(train_cmd, timeout=3600 * 4)
    run_dir = None
    for line in proc.stdout.splitlines():
        if "run dir:" in line:
            run_dir = line.split("run dir:", 1)[1].strip()
    assert run_dir, proc.stdout[-800:]

    # 3. final accuracy at the reference eval setting
    eval_cmd = [sys.executable, str(ROOT / "tools" / "eval_ckpt.py"),
                "--run", run_dir, "--dataset", dataset,
                "--data-dir", str(data_dir),
                "--solver", "dopri5", "--tol", "1e-3"]
    if limit:
        eval_cmd += ["--limit", str(limit)]
    if cpu:
        eval_cmd += ["--cpu"]
    top1 = _last_json(_sub(eval_cmd, timeout=3600).stdout)["top1"]

    # 4. execution-model parity (jax vs torch oracle, identical weights)
    parity_cmd = [sys.executable, str(ROOT / "tools" / "parity_eval.py"),
                  "--run", run_dir,
                  "--limit", str(min(limit or 2000, 2000)),
                  "--data-dir", str(data_dir)]
    if cpu:
        parity_cmd += ["--cpu"]
    try:
        parity = _last_json(_sub(parity_cmd, timeout=3600).stdout)
    except Exception as e:  # oracle path is informative, not gating
        parity = {"error": str(e)[:300]}

    target = TARGETS[dataset]
    verdict = {
        "dataset": dataset,
        "data": "fabricated" if fabricated else "real",
        "top1": top1,
        "target": target,
        "meets_target": (None if (target is None or fabricated)
                         else top1 >= target),
        "parity": parity,
        "parity_within_0.2pct": (
            abs(parity.get("top1_jax", 0) - parity.get("top1_torch", 1))
            <= 0.002 if "top1_jax" in parity else None),
        "epochs": epochs,
        "run_dir": run_dir,
        "wall_s": round(time.time() - t_start, 1),
    }
    out = ROOT / "runs_protocol" / f"{dataset}_verdict.json"
    out.parent.mkdir(exist_ok=True)
    out.write_text(json.dumps(verdict, indent=2))
    print(json.dumps(verdict), flush=True)
    return verdict


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="mnist",
                   choices=["mnist", "cifar10", "both"])
    p.add_argument("--data-dir", default=str(ROOT / "data"))
    p.add_argument("--epochs", type=int, default=160)
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--fabricate", action="store_true",
                   help="write real-format files from the synthetic twins "
                        "first (end-to-end exercise; verdict labelled "
                        "fabricated)")
    p.add_argument("--smoke", action="store_true",
                   help="tiny run: 2 epochs, 2048 images, CPU")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)

    if args.smoke:
        args.epochs = min(args.epochs, 2)
        args.limit = args.limit or 2048
        args.cpu = True

    datasets = (["mnist", "cifar10"] if args.dataset == "both"
                else [args.dataset])
    data_dir = Path(args.data_dir)
    for ds in datasets:
        if args.fabricate:
            fabricate(ds, data_dir, args.limit)
        run_protocol(ds, data_dir, epochs=args.epochs, limit=args.limit,
                     cpu=args.cpu, fabricated=args.fabricate)


if __name__ == "__main__":
    main()
