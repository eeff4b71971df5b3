"""Bayes-ceiling probe for synthetic stand-in payloads (VERDICT r2 #7).

For each dataset, measures on the stand-in payload:
  feat_only   — validation-tuned ridge on features (the MLP proxy; should
                sit near the documented MLP row of performance.jpg)
  oracle_1hop — ridge on [features ‖ true 1-hop neighbor class mix]
  oracle_2hop — ridge on [features ‖ 1-hop ‖ 2-hop class mixes]

The oracle columns see the TRUE labels of neighbors, so they upper-bound
what any structure-aware model (PathNet included) can extract from the
payload.  If oracle_2hop sits below the reference's PathNet accuracy, the
gap is payload-limited, not model-limited — the stand-in label field
cannot carry the full structure signal of the real (missing) payload.

Writes results/standin_ceiling.json.

Context: the cornell stand-in was switched to the invertible "matching"
compatibility (synthetic.compat_matrix offdiag), which raised the oracle
ceiling from ~83% to ~86%; the reference reports 91.35% on the real
payload, so ~5 points remain payload-limited (the 183-node graph with its
degree-190 hub supports only so much pairwise label structure at edge
homophily 0.30).
"""
from __future__ import annotations

import json
import sys

import numpy as np
import scipy.sparse as sp

sys.path.insert(0, ".")

from pathnet_tpu.data.registry import DATASETS, load_dataset  # noqa: E402
from pathnet_tpu.data.splits import get_whole_mask, ratio_masks  # noqa: E402
from pathnet_tpu.data.synthetic import edge_homophily  # noqa: E402

REFERENCE_PATHNET = {  # performance.jpg PathNet row
    "cornell": 0.9135, "cora": 0.8576, "citeseer": 0.7798, "pubmed": 0.8892,
    "Nba": 0.7169, "bgp": 0.6572, "Electronics": 0.7697,
}


def ridge(Xf, y, tr, va, te, C):
    d = Xf.shape[1]
    oh = np.eye(C, dtype=np.float64)[y[tr]]
    G = (Xf[tr].T @ Xf[tr]).astype(np.float64)
    B = (Xf[tr].T @ oh).astype(np.float64)
    best, bv = None, -1.0
    for lam in (1e-2, 1e-1, 1.0, 10.0, 100.0):
        W = np.linalg.solve(G + lam * np.eye(d), B)
        a = float(((Xf[va] @ W).argmax(1) == y[va]).mean())
        if a > bv:
            best, bv = W, a
    return float(((Xf[te] @ best).argmax(1) == y[te]).mean())


def probe(name: str, rounds: int = 5) -> dict:
    spec = DATASETS[name]
    g, *_ = load_dataset(name, "data", 0)
    y = g.labels
    C = spec.num_classes
    A = sp.coo_matrix((np.ones(len(g.src)), (g.src, g.dst)),
                      shape=(g.n, g.n)).tocsr()
    A = ((A + A.T) > 0).astype(np.float32)
    A.setdiag(0)
    A.eliminate_zeros()
    eye = np.eye(C, dtype=np.float32)
    c1 = A @ eye[y]
    A2 = A @ A
    A2.setdiag(0)
    c2 = A2 @ eye[y]
    n1 = c1 / np.maximum(c1.sum(1, keepdims=True), 1)
    n2 = c2 / np.maximum(c2.sum(1, keepdims=True), 1)
    X = g.features
    accF, acc1, acc2 = [], [], []
    for r in range(rounds):
        if spec.split == "random":
            tr, va, te = get_whole_mask(y, seed=r + 1)
        else:
            tr, va, te = ratio_masks(g.n, seed=1000 + r,
                                     val_size=spec.val_size)
        accF.append(ridge(X, y, tr, va, te, C))
        acc1.append(ridge(np.hstack([X, n1 * 5]), y, tr, va, te, C))
        acc2.append(ridge(np.hstack([X, n1 * 5, n2 * 5]), y, tr, va, te, C))
    return {
        "homophily": round(edge_homophily(g.src, g.dst, y), 3),
        "feat_only": round(float(np.mean(accF)), 4),
        "oracle_1hop": round(float(np.mean(acc1)), 4),
        "oracle_2hop": round(float(np.mean(acc2)), 4),
        "reference_pathnet": REFERENCE_PATHNET.get(name),
    }


def main():
    names = sys.argv[1:] or ["cornell", "texas", "wisconsin", "Nba"]
    out = {}
    for name in names:
        out[name] = probe(name)
        print(name, out[name], flush=True)
    with open("results/standin_ceiling.json", "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
