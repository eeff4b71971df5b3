"""Calibrate the SBM stand-ins' ``structure`` against the documented
PathNet−MLP gap (VERDICT r2 weak #4: stand-ins overshoot).

The feature ``signal`` is calibrated elsewhere so a ridge probe == the MLP
row of performance.jpg.  This script calibrates the *second* axis: how much
extra accuracy neighbor-label structure can contribute.  Proxy: the gap
between a ridge on [feature-sketch] and on [feature-sketch ‖ 1-hop class
mix] (true labels — a structure-information upper proxy).  Bisect
``structure`` until that gap matches the documented PathNet−MLP gap, so the
stand-in's structure headroom mirrors the real dataset's instead of
saturating at +20 pts (the committed Electronics run at structure=0.75 hit
0.949 vs the reference's 0.770).

Only meaningful for SBM stand-ins (labels drawn jointly with edges, exact
matrix statistics).  Wide feature payloads are sketched to 256 dims with a
fixed random projection — the gap, not the absolute level, is the target.

Run: python scripts/calibrate_structure.py [names...]
"""
from __future__ import annotations

import sys

import numpy as np
import scipy.sparse as sp

sys.path.insert(0, ".")

from pathnet_tpu.data.registry import DATASETS, _stable_seed  # noqa: E402
from pathnet_tpu.data.splits import get_whole_mask, ratio_masks  # noqa: E402
from pathnet_tpu.data.synthetic import synthetic_graph  # noqa: E402

# documented PathNet − MLP gap (performance.jpg); Dblp absent -> assume
# the large-graph band (~+2)
GAP_TARGET = {
    "pubmed": 0.0227, "bgp": 0.0233, "Electronics": 0.0194, "Dblp": 0.02,
    "chameleon": 0.08, "squirrel": 0.06, "film": 0.02,  # H2GCN-era bands
    "texas": 0.04, "wisconsin": 0.04,
}


def ridge(Xf, y, tr, va, te, C):
    d = Xf.shape[1]
    oh = np.eye(C, dtype=np.float64)[y[tr]]
    G = (Xf[tr].T @ Xf[tr]).astype(np.float64)
    B = (Xf[tr].T @ oh).astype(np.float64)
    best, bv = None, -1.0
    for lam in (1e-1, 1.0, 10.0, 100.0):
        W = np.linalg.solve(G + lam * np.eye(d), B)
        a = float(((Xf[va] @ W).argmax(1) == y[va]).mean())
        if a > bv:
            best, bv = W, a
    return float(((Xf[te] @ best).argmax(1) == y[te]).mean())


def measure_gap(spec, structure, rounds=3):
    g = synthetic_graph(spec.n, spec.avg_deg, spec.num_classes,
                        spec.homophily, spec.feat_dim, signal=spec.signal,
                        structure=structure, seed=_stable_seed(spec.name),
                        offdiag=spec.offdiag)
    y = g.labels
    C = spec.num_classes
    X = g.features
    if X.shape[1] > 256:
        proj = np.random.default_rng(0).normal(
            0, 1 / np.sqrt(X.shape[1]), size=(X.shape[1], 256)).astype(np.float32)
        X = X @ proj
    A = sp.coo_matrix((np.ones(len(g.src)), (g.src, g.dst)),
                      shape=(g.n, g.n)).tocsr()
    A = ((A + A.T) > 0).astype(np.float32)
    A.setdiag(0)
    c1 = A @ np.eye(C, dtype=np.float32)[y]
    n1 = c1 / np.maximum(c1.sum(1, keepdims=True), 1)
    gaps, feats = [], []
    for r in range(rounds):
        if spec.split == "random":
            tr, va, te = get_whole_mask(y, seed=r + 1)
        else:
            tr, va, te = ratio_masks(g.n, seed=1000 + r,
                                     val_size=spec.val_size)
        f = ridge(X, y, tr, va, te, C)
        fn = ridge(np.hstack([X, n1 * 5]), y, tr, va, te, C)
        feats.append(f)
        gaps.append(fn - f)
    return float(np.mean(feats)), float(np.mean(gaps))


def calibrate(name):
    spec = DATASETS[name]
    if spec.edge_file is not None:
        print(f"{name}: real structure — structure calibration is for SBM "
              "stand-ins; skipping")
        return
    target = GAP_TARGET.get(name)
    if target is None:
        print(f"{name}: no gap target; skipping")
        return
    lo, hi = 0.0, 0.9
    f_lo, g_lo = measure_gap(spec, lo)
    f_hi, g_hi = measure_gap(spec, hi)
    print(f"{name}: gap({lo})={g_lo:+.4f} gap({hi})={g_hi:+.4f} "
          f"target={target:+.4f}")
    if g_hi <= target:
        print(f"    -> structure=0.9 (gap saturates below target)")
        return
    for _ in range(7):
        mid = 0.5 * (lo + hi)
        f, gp = measure_gap(spec, mid)
        if gp < target:
            lo = mid
        else:
            hi = mid
    s = 0.5 * (lo + hi)
    f, gp = measure_gap(spec, s, rounds=5)
    print(f"{name}: structure={s:.2f} -> feat={f:.3f} gap={gp:+.4f} "
          f"(target {target:+.4f})")
    print(f"    -> structure={s:.2f}")


if __name__ == "__main__":
    names = sys.argv[1:] or ["pubmed", "bgp", "Electronics", "Dblp"]
    for name in names:
        calibrate(name)
