"""Downstream feature-quality metrics: linear probe, kNN, retrieval mAP.

Capability parity with the reference's evaluation scripts (reference:
evaluate.py / notebooks — file names LOW-confidence, capability HIGH;
SURVEY.md §3.5): given per-t feature matrices, compute classification and
retrieval quality per t — the papers' metric-vs-t curves.
"""

from __future__ import annotations

import numpy as np

__all__ = ["linear_probe_acc", "knn_acc", "retrieval_map", "evaluate_features"]


def linear_probe_acc(
    train_f: np.ndarray, train_y: np.ndarray,
    test_f: np.ndarray, test_y: np.ndarray,
) -> float:
    """Multinomial logistic-regression probe (features are frozen)."""
    from sklearn.linear_model import LogisticRegression
    from sklearn.preprocessing import StandardScaler

    scaler = StandardScaler().fit(train_f)
    clf = LogisticRegression(max_iter=2000, C=1.0)
    clf.fit(scaler.transform(train_f), train_y)
    return float(clf.score(scaler.transform(test_f), test_y))


def knn_acc(
    train_f: np.ndarray, train_y: np.ndarray,
    test_f: np.ndarray, test_y: np.ndarray,
    k: int = 5,
) -> float:
    from sklearn.neighbors import KNeighborsClassifier

    clf = KNeighborsClassifier(n_neighbors=k)
    clf.fit(train_f, train_y)
    return float(clf.score(test_f, test_y))


def retrieval_map(feats: np.ndarray, labels: np.ndarray,
                  block: int = 512) -> float:
    """Leave-one-out retrieval mean average precision with L2 ranking:
    each sample queries the rest of the set; relevant = same label.

    The (block, N) distance matmul is f32 (the one-shot f64 (N, N) matrix
    was ~800 MB at N=10k); the cumsum/precision arithmetic stays f64 —
    it is cheap relative to the matmul and keeps mAP comparable to the
    round-1 f64 numbers at the ~1e-6 level (ADVICE r2).  f32 distances can
    in principle reorder exact ties vs f64; with continuous features ties
    have measure zero."""
    feats = np.ascontiguousarray(feats, np.float32)
    n = len(feats)
    sq = np.sum(feats**2, axis=1)
    ranks = np.arange(1, n, dtype=np.float64)  # 1-based positions
    ap_sum = 0.0
    for lo in range(0, n, block):
        hi = min(lo + block, n)
        d2 = (sq[lo:hi, None] + sq[None, :]
              - 2.0 * (feats[lo:hi] @ feats.T))
        d2[np.arange(hi - lo), np.arange(lo, hi)] = np.inf
        order = np.argsort(d2, axis=1)[:, : n - 1]
        rel = labels[order] == labels[lo:hi, None]
        cum_rel = np.cumsum(rel, axis=1, dtype=np.float64)
        precision_at = cum_rel / ranks[None, :]
        n_rel = rel.sum(axis=1)
        ap = np.where(
            n_rel > 0,
            (precision_at * rel).sum(axis=1) / np.maximum(n_rel, 1),
            0.0,
        )
        ap_sum += float(ap.sum())
    return ap_sum / n


def evaluate_features(
    train_feats: np.ndarray | None,
    train_labels: np.ndarray | None,
    test_feats: np.ndarray,
    test_labels: np.ndarray,
    *,
    metrics=("linear", "knn", "map"),
    knn_k: int = 5,
    probe_split: float = 0.5,
    seed: int = 0,
) -> dict[str, float]:
    """Metrics for ONE t's feature matrix.  Without a train split, probes use
    a random half/half split of the test features (deterministic in seed)."""
    if train_feats is None:
        rng = np.random.default_rng(seed)
        idx = rng.permutation(len(test_feats))
        cut = int(len(idx) * probe_split)
        if cut < 2 or len(idx) - cut < 1:
            raise ValueError(
                f"too few samples ({len(idx)}) for a {probe_split:.0%} "
                "self-split probe — pass explicit train features or more data"
            )
        train_feats, train_labels = test_feats[idx[:cut]], test_labels[idx[:cut]]
        test_feats_p, test_labels_p = test_feats[idx[cut:]], test_labels[idx[cut:]]
    else:
        test_feats_p, test_labels_p = test_feats, test_labels

    out = {}
    if "linear" in metrics:
        out["linear_acc"] = linear_probe_acc(
            train_feats, train_labels, test_feats_p, test_labels_p
        )
    if "knn" in metrics:
        out["knn_acc"] = knn_acc(
            train_feats, train_labels, test_feats_p, test_labels_p, k=knn_k
        )
    if "map" in metrics:
        out["retrieval_map"] = retrieval_map(test_feats, test_labels)
    return out
