"""Bayes-ceiling probe for synthetic stand-in payloads (VERDICT r2 #7, r4 #9).

For each dataset, measured on the payload exactly as the registry loads it:
  feat_only   — logistic probe on the C centroid scores of the features
                (MLP proxy; should sit near the documented MLP row)
  oracle_1hop — + observed 1-hop neighbor class mixes
  oracle_2hop — + 2-hop mixes (max over sub-blocks per round: a superset
                of information can never be worth less)

Probes are scripts/probes.py (centroid-score logistic): the r3 plain-ridge
probes understated MLP-reachable accuracy under label noise and sketch bias
by up to 13 pts (citeseer 0.717 sketched vs 0.833 true), which mis-anchored
the r3 calibration.  The oracle columns upper-bound what any
structure-aware model can extract from the payload; the r4 calibration
(scripts/calibrate_v2.py) enforces oracle_2hop - feat >= 3 pts wherever the
graph supports it, so the graph path is *detectable* on every dataset
(exceptions measured + documented: tiny WebKB graphs whose hub-dominated
183-251-node structure caps mix information — see results/calibration_v2.json).

Writes results/standin_ceiling.json.
"""
from __future__ import annotations

import json
import sys

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

from pathnet_tpu.data.registry import (DATASETS, _stable_seed,  # noqa: E402
                                       load_dataset)
from pathnet_tpu.data.splits import get_whole_mask, ratio_masks  # noqa: E402
from pathnet_tpu.data.synthetic import edge_homophily, graph_bits  # noqa: E402
from probes import (centroid_scores, logistic_probe, neighbor_mixes,  # noqa: E402
                    path_oracle_probe, sample_walk_pattern_hist)

REFERENCE_PATHNET = {  # performance.jpg PathNet row
    "cornell": 0.9135, "cora": 0.8576, "citeseer": 0.7798, "pubmed": 0.8892,
    "Nba": 0.7169, "bgp": 0.6572, "Electronics": 0.7697,
}


def probe(name: str, rounds: int = None) -> dict:
    spec = DATASETS[name]
    g, *_ = load_dataset(name, "data", 0)
    y = g.labels
    C = spec.num_classes
    if rounds is None:
        rounds = 8 if g.n <= 1500 else 3
    n1, n2 = neighbor_mixes(g.src, g.dst, g.n, y, C)
    X = g.features
    hist = None
    if spec.pattern_frac > 0:
        # regenerate the channel's bit field + sampled-walk histogram under
        # the same seeds/measure as payload generation (r5 path oracle)
        prob = (g.prob if (g.prob is not None and len(g.prob)
                           and np.ptp(g.prob) > 1e-12) else None)
        bits = graph_bits(g.src, g.dst, g.n, _stable_seed(name) + 3,
                          smooth=spec.bit_smooth)
        hist = sample_walk_pattern_hist(g.src, g.dst, g.n, bits,
                                        num_walks=40,
                                        seed=_stable_seed(name) + 5,
                                        prob=prob)
    accF, acc1, acc2, accP = [], [], [], []
    for r in range(rounds):
        if spec.split == "random":
            tr, va, te = get_whole_mask(y, seed=r + 1)
        else:
            tr, va, te = ratio_masks(g.n, seed=1000 + r,
                                     val_size=spec.val_size)
        s = centroid_scores(X, y, tr, C)
        f = logistic_probe(s, y, tr, va, te, C)
        F1 = np.hstack([s, n1.astype(np.float32) * 3.0])
        F2 = np.hstack([s, n1.astype(np.float32) * 3.0,
                        n2.astype(np.float32) * 3.0])
        m1 = logistic_probe(F1[:, C:], y, tr, va, te, C)
        o1 = logistic_probe(F1, y, tr, va, te, C)
        m2 = logistic_probe(F2[:, C:], y, tr, va, te, C)
        o2 = logistic_probe(F2, y, tr, va, te, C)
        accF.append(f)
        acc1.append(max(o1, m1, f))
        acc2.append(max(o2, m2, o1, m1, f))
        if hist is not None:
            po = path_oracle_probe(X, y, tr, va, te, C, n1, n2, hist)
            accP.append(max(po, acc2[-1]))
    return {
        "homophily": round(edge_homophily(g.src, g.dst, y), 3),
        "feat_only": round(float(np.mean(accF)), 4),
        "oracle_1hop": round(float(np.mean(acc1)), 4),
        "oracle_2hop": round(float(np.mean(acc2)), 4),
        "path_oracle": (round(float(np.mean(accP)), 4) if accP else None),
        "reference_pathnet": REFERENCE_PATHNET.get(name),
    }


def main():
    names = sys.argv[1:] or list(DATASETS)
    import os
    path = "results/standin_ceiling.json"
    out = json.load(open(path)) if os.path.exists(path) else {}
    for name in names:
        out[name] = probe(name)
        print(name, out[name], flush=True)
        with open(path, "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
