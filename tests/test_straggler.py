"""NFE-bucketed batching (tools/straggler_bench.py): on a mixed-stiffness
pool, sorting by a loose-tolerance NFE probe must reduce executed lane work
(sum over batches of batch_size x max-NFE) toward the useful per-sample sum.
The flagship ODE-Net cannot show this (GroupNorm-normalised dynamics give
input-independent NFE — measured, RESULTS.md); this pins the mechanism on a
workload where per-sample NFE genuinely varies (VERDICT r1 #3)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from straggler_bench import run_bench  # noqa: E402


def test_nfe_sort_reduces_lane_work():
    r = run_bench(pool=512, batch_size=64, dim=8, lambda_max=200.0,
                  tol=1e-6, reps=1)
    lo, hi = r["nfe_spread"]
    assert hi > 2 * lo, f"pool must be NFE-heterogeneous, got {r['nfe_spread']}"
    assert r["lane_work_sorted"] < r["lane_work_shuffled"], r
    # Sorted batches should recover most of the shuffled pool's waste:
    # executed/useful overhead strictly shrinks.
    over_shuf = r["lane_work_shuffled"] / r["lane_work_useful"]
    over_sort = r["lane_work_sorted"] / r["lane_work_useful"]
    assert over_sort < 0.7 * over_shuf, (over_shuf, over_sort)
    # Batch-global comparison column (VERDICT r3 #6): the reference's
    # execution model dilutes stiff samples' errors in the batch-RMS norm —
    # its worst per-sample error (in tolerance units) must be visibly worse
    # than either per-sample mode on this heterogeneous pool.
    assert r["err_units_global"] > 2 * r["err_units_sorted"], r
    assert r["time_global_shuffled_s"] > 0 and r["lane_work_global"] > 0
