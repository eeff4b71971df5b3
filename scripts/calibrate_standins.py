"""Calibrate synthetic stand-in feature signal per dataset.

The reference snapshot ships no feature/label payloads (.MISSING_LARGE_BLOBS),
so the registry attaches synthetic stand-ins.  For the protocol results to be
*meaningful*, a feature-only model must land near the documented MLP row of
the paper's table (performance.jpg) — then the structure-derived headroom
that PathNet exploits mirrors the real datasets' MLP→PathNet gap.

Payload model (pathnet_tpu/data/synthetic.py): a clean field y* drives the
graph coupling and the class-conditional features; the OBSERVED labels are
y* flipped to uniform with the spec's ``label_noise`` ρ, capping every model
at ceiling = (1-ρ) + ρ/C ≈ the documented PathNet row + 2 pts.  This script
bisects the feature ``signal`` so a validation-tuned ridge probe (MLP proxy)
on the observed labels hits the documented MLP accuracy, reproducing the
payload pipeline of registry.load_dataset exactly (same seeds, same flip).

Run: python scripts/calibrate_standins.py [names...]
"""
from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")

from pathnet_tpu.data.registry import DATASETS, _stable_seed, load_structure  # noqa: E402
from pathnet_tpu.data.splits import get_whole_mask, ratio_masks  # noqa: E402
from pathnet_tpu.data.synthetic import (compat_labels, edge_homophily,  # noqa: E402
                                        field_homophily_for, flip_labels,
                                        synthetic_features)

# documented MLP test accuracy (performance.jpg row 2); Dblp is not in the
# table — target a mid-band value.  Geom-GCN datasets: MLP rows of the
# H2GCN paper (table 3).
MLP_TARGET = {
    "cornell": 0.8108, "cora": 0.7475, "citeseer": 0.7241, "pubmed": 0.8665,
    "Nba": 0.5921, "bgp": 0.6339, "Electronics": 0.7503, "Dblp": 0.70,
    "texas": 0.8189, "wisconsin": 0.8529, "film": 0.3653,
    "squirrel": 0.2968, "chameleon": 0.4636,
}


def ridge_probe(X, y, train, val, test, num_classes) -> float:
    """MLP proxy: max of validation-tuned ridge and nearest-centroid.

    Under heavy label noise the one-vs-all ridge plateaus well below the
    Bayes rule while a CE-trained MLP does not (measured: film at signal 40
    — ridge 0.27, nearest-centroid 0.43 ≈ the 0.42 ceiling); the
    nearest-centroid rule is Bayes-optimal for the isotropic Gaussian
    payload, so the max of the two tracks an actual tuned MLP."""
    Xtr, ytr = X[train], y[train]
    d = X.shape[1]
    onehot = np.eye(num_classes, dtype=np.float32)[ytr]
    G = (Xtr.T @ Xtr).astype(np.float64)
    B = (Xtr.T @ onehot).astype(np.float64)
    best, best_val = None, -1.0
    for lam in (1e-2, 1e-1, 1.0, 10.0, 100.0):
        W = np.linalg.solve(G + lam * np.eye(d), B)
        va = float((np.asarray(X[val] @ W).argmax(1) == y[val]).mean())
        if va > best_val:
            best, best_val = W, va
    ridge = float((np.asarray(X[test] @ best).argmax(1) == y[test]).mean())
    cent = np.stack([Xtr[ytr == c].mean(0) if (ytr == c).any()
                     else Xtr.mean(0) for c in range(num_classes)])
    pred = ((X[test][:, None, :] - cent[None]) ** 2).sum(-1).argmin(1)
    centroid = float((pred == y[test]).mean())
    return max(ridge, centroid)


def masks_for(spec, y, round_i):
    if spec.split == "random":
        return get_whole_mask(y, seed=round_i + 1)
    return ratio_masks(len(y), seed=1000 + round_i, val_size=spec.val_size)


def build_field(name):
    """(graph, y_true, y_obs, seed) exactly as registry.load_dataset."""
    spec = DATASETS[name]
    seed = _stable_seed(name)
    g = load_structure(name)
    if spec.edge_file is not None:
        h_field = field_homophily_for(spec.homophily, spec.label_noise,
                                      spec.num_classes)
        y_true = compat_labels(g, spec.num_classes, h_field, spec.structure,
                               seed=seed, offdiag=spec.offdiag)
    else:
        # SBM: synthetic_graph draws the field first with the same rng
        # stream (labels are its first draw)
        rng = np.random.default_rng(seed)
        y_true = rng.integers(0, spec.num_classes, size=spec.n).astype(np.int64)
    y_obs = flip_labels(y_true, spec.label_noise, spec.num_classes, seed + 2)
    if spec.edge_file is None and g.labels is not None:
        assert np.array_equal(y_obs, g.labels), \
            "reconstructed SBM observed labels mismatch the loader's"
    return g, y_true, y_obs, seed


def probe_acc(spec, g, y_true, y_obs, signal, seed, rounds=3) -> float:
    n_train = max(1, int(0.48 * g.n))
    X = synthetic_features(y_true, spec.feat_dim, spec.num_classes, signal,
                           seed + 1, n_train)
    if X.shape[1] > 2048:   # sketch very wide payloads (2-CPU host); a
        # N(0, 1/d) projection scales class means and noise identically, so
        # the probe's SNR is preserved — only the d/n_train ridge shrinkage
        # changes, negligible at the n_train sizes that reach this branch
        proj = np.random.default_rng(0).normal(
            0, 1 / np.sqrt(X.shape[1]), size=(X.shape[1], 1024)).astype(np.float32)
        X = X @ proj
    accs = []
    for r in range(rounds):
        tr, va, te = masks_for(spec, y_obs, r)
        accs.append(ridge_probe(X, y_obs, tr, va, te, spec.num_classes))
    return float(np.mean(accs))


def calibrate(name: str) -> None:
    spec = DATASETS[name]
    g, y_true, y_obs, seed = build_field(name)
    h = edge_homophily(g.src, g.dst, y_obs)
    ceiling = (1 - spec.label_noise) + spec.label_noise / spec.num_classes
    target = MLP_TARGET[name]
    lo, hi = 0.3, 40.0   # heavy label noise dilutes the usable
    # regression signal by ~(1-rho); film/squirrel need >10
    for _ in range(13):
        mid = 0.5 * (lo + hi)
        acc = probe_acc(spec, g, y_true, y_obs, mid, seed)
        if acc < target:
            lo = mid
        else:
            hi = mid
    sig = 0.5 * (lo + hi)
    acc = probe_acc(spec, g, y_true, y_obs, sig, seed, rounds=5)
    print(f"{name}: hom target={spec.homophily:.2f} measured={h:.3f} | "
          f"ceiling={ceiling:.3f} | MLP target={target:.3f} ridge={acc:.3f} "
          f"@ signal={sig:.2f}")
    print(f"    -> signal={sig:.2f}", flush=True)


if __name__ == "__main__":
    names = sys.argv[1:] or list(DATASETS)
    for name in names:
        calibrate(name)
