#!/usr/bin/env python
"""Multi-seed accuracy campaign (VERDICT r2 #6): rerun every
learning-dependent claim at >= 3 seeds and report mean ± std, so
RESULTS.md's discrimination claims carry error bars.

Campaign (all on the hardened synthetic twins — real files absent, zero
egress):
  flagship   synthetic-cifar10, 24 epochs, adjoint dopri5 tol 1e-3
  adjsweep   synthetic-mnist 16,384 imgs, 8 epochs: reintegrate /
             interpolated / seminorm / direct-backprop
  ladder     each flagship checkpoint evaluated at the solver-fidelity
             rungs (euler 1/4 steps, dopri5 tol 1e-1..1e-4)

Writes one JSON line per completed cell to ``runs_tpu/multiseed.jsonl``
(append-only, resumable: cells already present are skipped), and a summary
table to stdout at the end via ``--summarize``.

reference: train.py / eval protocol of the reference repo — UNVERIFIED
(SURVEY.md §4 items 6-7: the reference reports single-seed accuracies; the
error bars here EXCEED reference parity on purpose).
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
OUT = ROOT / "runs_tpu" / "multiseed.jsonl"
SEEDS = [0, 1, 2]


def _done() -> set[str]:
    if not OUT.exists():
        return set()
    keys = set()
    for line in OUT.read_text().splitlines():
        try:
            keys.add(json.loads(line)["key"])
        except (json.JSONDecodeError, KeyError):
            pass
    return keys


def _emit(rec: dict) -> None:
    OUT.parent.mkdir(exist_ok=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(f"[multiseed] {rec['key']}: {rec}", flush=True)


def _best_top1(run_dir: Path) -> float:
    import csv

    with open(run_dir / "log.csv") as f:
        rows = list(csv.DictReader(f))
    return max(float(r["test_acc"]) for r in rows if r.get("test_acc"))


def _run_train(args_list: list[str], runs_dir: Path) -> Path:
    """Run train.py; returns the run dir (parsed from the params signature
    by re-deriving it through expman)."""
    cmd = [sys.executable, str(ROOT / "train.py"), *args_list,
           "--runs-dir", str(runs_dir)]
    t0 = time.time()
    proc = subprocess.run(cmd, cwd=str(ROOT), capture_output=True, text=True,
                          timeout=5400, start_new_session=True)
    if proc.returncode != 0:
        raise RuntimeError(
            f"train failed rc={proc.returncode}:\n{proc.stdout[-1000:]}\n"
            f"{proc.stderr[-1000:]}")
    # train.py prints "run dir: <path>" — parse it.
    for line in proc.stdout.splitlines():
        if "run dir:" in line:
            return Path(line.split("run dir:", 1)[1].strip())
    # Fallback: newest dir in runs_dir
    dirs = sorted(runs_dir.glob("*/"), key=lambda p: p.stat().st_mtime)
    if not dirs:
        raise RuntimeError(f"no run dir produced:\n{proc.stdout[-2000:]}")
    print(f"[multiseed] warn: run dir not in stdout, using newest "
          f"({time.time()-t0:.0f}s)", flush=True)
    return dirs[-1]


def _run_train_population(
    args_list: list[str], seeds: list[int], runs_dir: Path
) -> dict[int, Path]:
    """Run ONE ``train.py --seeds`` population process covering every seed
    (multi.PopulationTrainer: one vmapped dispatch per epoch trains all of
    them).  Returns {seed: run_dir} parsed from the per-seed banner lines.

    Per-seed values match solo runs up to XLA reduction-order noise (see
    multi.py docstring), so population cells and solo cells are the same
    campaign cell statistically — mean±std reporting is unaffected.
    """
    cmd = [sys.executable, str(ROOT / "train.py"), *args_list,
           "--seeds", ",".join(str(s) for s in seeds),
           "--runs-dir", str(runs_dir)]
    # One process does ~K seeds' compute: scale the solo budget by K.
    proc = subprocess.run(cmd, cwd=str(ROOT), capture_output=True, text=True,
                          timeout=5400 * max(1, len(seeds)),
                          start_new_session=True)
    if proc.returncode != 0:
        raise RuntimeError(
            f"population train failed rc={proc.returncode}:\n"
            f"{proc.stdout[-1000:]}\n{proc.stderr[-1000:]}")
    dirs: dict[int, Path] = {}
    for line in proc.stdout.splitlines():
        if line.startswith("run dir (seed "):
            head, path = line.split("):", 1)
            dirs[int(head.removeprefix("run dir (seed "))] = (
                Path(path.strip()))
    missing = [s for s in seeds if s not in dirs]
    if missing:
        raise RuntimeError(
            f"population run dirs missing for seeds {missing}:\n"
            f"{proc.stdout[-2000:]}")
    return dirs


FLAGSHIP_ARGS = ["--dataset", "synthetic-cifar10", "--epochs", "24",
                 "--lr-decay-epochs", "12,18,22", "--tol", "1e-3"]


def flagship(seed: int, runs_dir: Path) -> Path:
    key = f"flagship-seed{seed}"
    run_dir = _run_train([*FLAGSHIP_ARGS, "--seed", str(seed)], runs_dir)
    _emit({"key": key, "top1": _best_top1(run_dir),
           "run_dir": str(run_dir)})
    return run_dir


def flagship_population(seeds: list[int], runs_dir: Path) -> dict[int, Path]:
    dirs = _run_train_population(FLAGSHIP_ARGS, seeds, runs_dir)
    for seed, run_dir in dirs.items():
        _emit({"key": f"flagship-seed{seed}", "top1": _best_top1(run_dir),
               "run_dir": str(run_dir), "population": True})
    return dirs


def _adjsweep_args(mode: str) -> list[str]:
    base = ["--dataset", "synthetic-mnist", "--epochs", "8",
            "--limit", "16384", "--lr-decay-epochs", "5,7", "--tol", "1e-3"]
    extra = {
        "reintegrate": [],
        "interpolated": ["--adjoint-mode", "interpolated"],
        "seminorm": ["--adjoint-seminorm"],
        "backprop": ["--no-adjoint"],
    }[mode]
    return base + extra


def adjsweep(seed: int, mode: str, runs_dir: Path) -> None:
    key = f"adjsweep-{mode}-seed{seed}"
    run_dir = _run_train([*_adjsweep_args(mode), "--seed", str(seed)],
                         runs_dir)
    _emit({"key": key, "top1": _best_top1(run_dir),
           "run_dir": str(run_dir)})


def adjsweep_population(
    seeds: list[int], mode: str, runs_dir: Path
) -> None:
    dirs = _run_train_population(_adjsweep_args(mode), seeds, runs_dir)
    for seed, run_dir in dirs.items():
        _emit({"key": f"adjsweep-{mode}-seed{seed}",
               "top1": _best_top1(run_dir), "run_dir": str(run_dir),
               "population": True})


LADDER = [
    ("euler1", ["--solver", "euler", "--steps", "1"]),
    ("euler4", ["--solver", "euler", "--steps", "4"]),
    ("dopri5-1e-1", ["--solver", "dopri5", "--tol", "1e-1"]),
    ("dopri5-1e-2", ["--solver", "dopri5", "--tol", "1e-2"]),
    ("dopri5-1e-3", ["--solver", "dopri5", "--tol", "1e-3"]),
    ("dopri5-1e-4", ["--solver", "dopri5", "--tol", "1e-4"]),
]


def ladder(seed: int, ckpt_dir: str) -> None:
    for rung, extra in LADDER:
        key = f"ladder-{rung}-seed{seed}"
        if key in _done():
            continue
        cmd = [sys.executable, str(ROOT / "tools" / "eval_ckpt.py"),
               "--run", ckpt_dir, "--dataset", "synthetic-cifar10",
               *extra]
        proc = subprocess.run(cmd, cwd=str(ROOT), capture_output=True,
                              text=True, timeout=2400,
                              start_new_session=True)
        if proc.returncode != 0:
            raise RuntimeError(f"ladder {key} failed:\n{proc.stdout[-800:]}"
                               f"\n{proc.stderr[-800:]}")
        result = json.loads(
            [ln for ln in proc.stdout.splitlines()
             if ln.strip().startswith("{")][-1])
        _emit({"key": key, **result})


def summarize() -> None:
    import collections

    import numpy as np

    if not OUT.exists():
        print("no multiseed.jsonl yet")
        return
    by_key = {}
    for line in OUT.read_text().splitlines():
        try:
            rec = json.loads(line)
        except json.JSONDecodeError:
            continue
        # Last write wins: concurrent runners can duplicate a cell (same
        # seed => identical result, deterministic training), but n must
        # count SEEDS, not lines.
        by_key[rec["key"]] = rec["top1"]
    groups = collections.defaultdict(list)
    for key, top1 in by_key.items():
        groups[key.rsplit("-seed", 1)[0]].append(top1)
    print(f"{'cell':34s} {'n':>2s} {'mean':>7s} {'std':>7s}  values")
    for base in sorted(groups):
        v = np.asarray(groups[base], float)
        print(f"{base:34s} {len(v):2d} {v.mean():7.4f} {v.std(ddof=1) if len(v) > 1 else 0.0:7.4f}  "
              + " ".join(f"{x:.4f}" for x in v))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--phase", default="all",
                   choices=["flagship", "adjsweep", "ladder", "all"])
    p.add_argument("--seeds", default="0,1,2")
    p.add_argument("--summarize", action="store_true")
    p.add_argument("--population", action="store_true",
                   help="train every missing seed of a cell in ONE "
                        "vmapped population run (train.py --seeds; one "
                        "dispatch per epoch covers all seeds) instead of "
                        "one process per seed")
    p.add_argument("--runs-dir", default=str(ROOT / "runs_tpu"))
    args = p.parse_args()
    if args.summarize:
        summarize()
        return
    seeds = [int(s) for s in args.seeds.split(",")]
    runs_dir = Path(args.runs_dir)

    flagship_dirs: dict[int, str] = {}
    for line in (OUT.read_text().splitlines() if OUT.exists() else []):
        try:
            rec = json.loads(line)
        except json.JSONDecodeError:
            continue
        if rec["key"].startswith("flagship-seed"):
            flagship_dirs[int(rec["key"].rsplit("seed", 1)[1])] = rec["run_dir"]

    if args.population:
        # Batch the missing seeds of each cell into one population run.
        if args.phase in ("flagship", "all", "ladder"):
            todo = [s for s in seeds if f"flagship-seed{s}" not in _done()]
            if todo:
                flagship_dirs.update(
                    {s: str(d) for s, d in
                     flagship_population(todo, runs_dir).items()})
        if args.phase in ("adjsweep", "all"):
            for mode in ("reintegrate", "interpolated", "seminorm",
                         "backprop"):
                todo = [s for s in seeds
                        if f"adjsweep-{mode}-seed{s}" not in _done()]
                if todo:
                    adjsweep_population(todo, mode, runs_dir)
        if args.phase in ("ladder", "all"):
            for seed in seeds:
                if seed in flagship_dirs:
                    ladder(seed, flagship_dirs[seed])
        return

    for seed in seeds:
        if args.phase in ("flagship", "all", "ladder"):
            if f"flagship-seed{seed}" not in _done():
                flagship_dirs[seed] = str(flagship(seed, runs_dir))
        if args.phase in ("adjsweep", "all"):
            for mode in ("reintegrate", "interpolated", "seminorm",
                         "backprop"):
                if f"adjsweep-{mode}-seed{seed}" not in _done():
                    adjsweep(seed, mode, runs_dir)
        if args.phase in ("ladder", "all") and seed in flagship_dirs:
            ladder(seed, flagship_dirs[seed])


if __name__ == "__main__":
    main()
