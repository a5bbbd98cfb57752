#!/usr/bin/env python
"""Evaluate extracted features: accuracy / retrieval-mAP vs integration time.

CLI parity with the reference's evaluation layer (reference: evaluate.py /
notebooks — SURVEY.md §3.5): reads the per-t feature file(s) written by
extract.py, computes linear-probe accuracy, kNN accuracy and retrieval mAP
at every t, and writes ``metrics_vs_t.csv`` next to the input — the data
behind the papers' metric-vs-t curves.

Example:
    python evaluate.py --features runs/<run>/features_test.h5 \
        --train-features runs/<run>/features_train.h5
"""

from __future__ import annotations

import argparse
import csv
from pathlib import Path

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--features", required=True,
                   help="test-split .h5 from extract.py")
    p.add_argument("--train-features", default=None,
                   help="optional train-split .h5 (probes train here; "
                        "default: half/half split of --features)")
    p.add_argument("--metrics", default="linear,knn,map")
    p.add_argument("--knn-k", type=int, default=5)
    p.add_argument("--limit", type=int, default=None,
                   help="subsample test features (mAP is O(N^2))")
    p.add_argument("--tsne", action="store_true",
                   help="also write 2-D t-SNE embeddings per t "
                        "(tsne_t*.csv next to the feature file)")
    p.add_argument("--output", default=None)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    import h5py

    from neural_ode_features_tpu.evaluation.probes import evaluate_features

    with h5py.File(args.features) as f:
        ts = np.asarray(f["t"])
        feats = np.asarray(f["features"])  # (T, N, C)
        labels = np.asarray(f["labels"])

    train = None
    if args.train_features:
        with h5py.File(args.train_features) as f:
            train = (np.asarray(f["features"]), np.asarray(f["labels"]))

    if args.limit and args.limit < feats.shape[1]:
        rng = np.random.default_rng(0)
        sel = rng.permutation(feats.shape[1])[: args.limit]
        feats, labels = feats[:, sel], labels[sel]

    metrics = tuple(args.metrics.split(","))
    rows = []
    for i, t in enumerate(ts):
        tf, tl = (train[0][i], train[1]) if train else (None, None)
        m = evaluate_features(tf, tl, feats[i], labels,
                              metrics=metrics, knn_k=args.knn_k)
        rows.append({"t": round(float(t), 4),
                     **{k: round(v, 4) for k, v in m.items()}})
        print(" | ".join(f"{k}={v}" for k, v in rows[-1].items()), flush=True)
        if args.tsne:
            from sklearn.manifold import TSNE

            emb = TSNE(n_components=2, init="pca", random_state=0,
                       perplexity=min(30, max(5, len(labels) // 20))
                       ).fit_transform(feats[i])
            out_t = Path(args.features).with_name(f"tsne_t{float(t):.2f}.csv")
            np.savetxt(out_t, np.column_stack([emb, labels]),
                       delimiter=",", header="x,y,label", comments="")
            print(f"  wrote {out_t}")

    out = Path(args.output) if args.output else (
        Path(args.features).with_name("metrics_vs_t.csv")
    )
    with open(out, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {out}")

    best = max(rows, key=lambda r: r.get("linear_acc", r.get("knn_acc", 0)))
    print(f"best t: {best}")
    return out


if __name__ == "__main__":
    main()
