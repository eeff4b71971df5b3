"""Joint stand-in recalibration: signal + label_noise + structure (r4).

VERDICT r3 weak #6 / next #9: several stand-ins carried ZERO structure
signal (PathNet == MLP to four decimals on Electronics; citeseer feat probe
overshot the MLP row by 10 pts from a sketch-biased ridge), so the protocol
could not *detect* the graph path.  This script recalibrates every dataset
so that, measured with the unbiased probes of scripts/probes.py:

  feat        ≈ documented MLP row (performance.jpg / H2GCN-era tables)
  oracle-feat ≥ 3 pts  (structure detectable)
  ceiling     ≈ documented PathNet row + ~5 pts (label noise cap)

Knobs per dataset: ``signal`` (bisected for feat), ``label_noise``
(ρ = (1-ceiling)/(1-1/C)), ``structure``/``offdiag`` (raised until the
oracle clears the floor).  Prints a registry patch table; the registry is
then hand-edited and the result verified by scripts/standin_ceiling.py.

Run: python scripts/calibrate_v2.py [names...]
"""
from __future__ import annotations

import json
import sys

import numpy as np

sys.path.insert(0, ".")

from pathnet_tpu.data.registry import DATASETS, _stable_seed, load_structure  # noqa: E402
from pathnet_tpu.data.splits import get_whole_mask, ratio_masks  # noqa: E402
from pathnet_tpu.data.synthetic import (compat_labels, compat_matrix,  # noqa: E402
                                        edge_homophily, field_homophily_for,
                                        flip_labels)
from probes import (centroid_scores, feat_probe, logistic_probe,  # noqa: E402
                    neighbor_mixes, oracle_probe)

# documented anchors: (PathNet row, MLP row).  Headline datasets from
# performance.jpg; GeomGCN-family PathNet anchors are the era's best GNN
# (H2GCN paper table 3) since the reference never ran PathNet there; Dblp
# has no published row — mid-band assumption, documented.
ANCHORS = {
    "cornell": (0.9135, 0.8108), "cora": (0.8576, 0.7475),
    "citeseer": (0.7798, 0.7241), "pubmed": (0.8892, 0.8665),
    "Nba": (0.7169, 0.5921), "bgp": (0.6572, 0.6339),
    "Electronics": (0.7697, 0.7503), "Dblp": (0.72, 0.70),
    "texas": (0.8486, 0.8189), "wisconsin": (0.8667, 0.8529),
    "film": (0.37, 0.3653), "squirrel": (0.365, 0.2968),
    "chameleon": (0.594, 0.4636),
}
ORACLE_FLOOR = 0.03
CEILING_MARGIN = 0.05


def masks_for(spec, y, round_i):
    if spec.split == "random":
        return get_whole_mask(y, seed=round_i + 1)
    return ratio_masks(len(y), seed=1000 + round_i, val_size=spec.val_size)


class Payload:
    """Reproduces registry payload generation for arbitrary knob values,
    with the feature draw factored so `signal` rescaling is free."""

    def __init__(self, name, structure, offdiag, label_noise, rho_eff=None):
        spec = DATASETS[name]
        self.spec = spec
        self.seed = _stable_seed(name)
        self.label_noise = label_noise
        # rho_eff: total label-uniformization rate for the homophily
        # correction (flips + pattern replacement — calibrate_v3)
        h_field = field_homophily_for(spec.homophily,
                                      label_noise if rho_eff is None
                                      else rho_eff, spec.num_classes)
        if spec.edge_file is not None or name in (
                "chameleon", "squirrel", "film") and _has_real(name):
            g = load_structure(name)
            self.y_true = compat_labels(g, spec.num_classes, h_field,
                                        structure, seed=self.seed,
                                        offdiag=offdiag)
            self.src, self.dst, self.n = g.src, g.dst, g.n
            # the sampler's actual transition probs (MERW from the real
            # edge file) — the pattern channel is defined under this measure
            self.prob = (g.prob if (g.prob is not None and len(g.prob)
                                    and np.ptp(g.prob) > 1e-12) else None)
        else:
            # SBM: replicate synthetic_graph's rng stream exactly
            rng = np.random.default_rng(self.seed)
            n = spec.n
            y = rng.integers(0, spec.num_classes, size=n).astype(np.int64)
            M = compat_matrix(spec.num_classes, h_field, structure, offdiag)
            m = int(n * spec.avg_deg / 2)
            by_class = [np.flatnonzero(y == c)
                        for c in range(spec.num_classes)]
            by_class = [b if len(b) else np.arange(n) for b in by_class]
            u = rng.integers(0, n, size=m)
            cdf = np.cumsum(M, axis=1)
            cls = (rng.random(m)[:, None] > cdf[y[u]]).sum(axis=1)
            cls = np.minimum(cls, spec.num_classes - 1)
            v = np.empty(m, dtype=np.int64)
            for c in range(spec.num_classes):
                sel = cls == c
                v[sel] = rng.choice(by_class[c], size=int(sel.sum()))
            self.src = np.concatenate([u, v]).astype(np.int32)
            self.dst = np.concatenate([v, u]).astype(np.int32)
            self.y_true, self.n = y, n
            self.prob = None
        self.y_obs = flip_labels(self.y_true, label_noise, spec.num_classes,
                                 self.seed + 2)
        self.h_obs = edge_homophily(self.src, self.dst, self.y_obs)
        self.n1, self.n2 = neighbor_mixes(self.src, self.dst, self.n,
                                          self.y_obs, spec.num_classes)
        # feature draw, signal-factored (synthetic_features rng stream:
        # centroids = rng.normal(0, scale, (C, d)); x = rng.normal(0,1,(n,d)))
        rng = np.random.default_rng(self.seed + 1)
        d = spec.feat_dim
        self.cunit = rng.normal(0, 1.0, size=(spec.num_classes, d))
        self.x0 = rng.normal(0, 1.0, size=(self.n, d)).astype(np.float32)
        n_train = max(1, int(0.48 * self.n))
        self.boost = float(np.sqrt(1.0 + d / n_train))

    def features(self, signal):
        d = self.spec.feat_dim
        scale = signal * self.boost / np.sqrt(2.0 * d)
        x = self.x0.copy()
        valid = self.y_true >= 0
        x[valid] += (scale * self.cunit)[self.y_true[valid]].astype(np.float32)
        return x

    def measure(self, signal, rounds=None):
        if rounds is None:
            rounds = 8 if self.n <= 1500 else 3
        X = self.features(signal)
        fa, oa = [], []
        for r in range(rounds):
            tr, va, te = masks_for(self.spec, self.y_obs, r)
            s = centroid_scores(X, self.y_obs, tr, self.spec.num_classes)
            f = logistic_probe(s, self.y_obs, tr, va, te,
                               self.spec.num_classes)
            F = np.hstack([s, self.n1.astype(np.float32) * 3.0,
                           self.n2.astype(np.float32) * 3.0])
            o = logistic_probe(F, self.y_obs, tr, va, te,
                               self.spec.num_classes)
            om = logistic_probe(F[:, self.spec.num_classes:], self.y_obs,
                                tr, va, te, self.spec.num_classes)
            fa.append(f)
            # the oracle sees a superset of the feat probe's information, so
            # per-round it is at least max(feat, mixes-only) (GD-path noise
            # on tiny test sets can rank them otherwise)
            oa.append(max(o, om, f))
        return float(np.mean(fa)), float(np.mean(oa))


def _has_real(name):
    import os
    return os.path.exists(os.path.join("data", "geomgcn", name,
                                       "out1_graph_edges.txt"))


def _fit_signal(p, mlp):
    lo, hi = 0.2, 40.0
    for _ in range(11):
        mid = 0.5 * (lo + hi)
        f = p.measure_feat(mid) if hasattr(p, "measure_feat") \
            else p.measure(mid)[0]
        if f < mlp:
            lo = mid
        else:
            hi = mid
    return 0.5 * (lo + hi)


def calibrate(name, mode="noise", rho_override=None):
    """``mode="noise"``: label-flip ceiling at PathNet_row+margin, escalate
    structure until the oracle clears the floor.  ``mode="clean"``: no
    flips; the ceiling emerges from the field itself — bisect ``structure``
    so the oracle lands at max(MLP+floor, PathNet anchor).  The clean mode
    exists because uniform flips at ρ>0.5 destroy neighbor-label
    information entirely (film/squirrel: oracle == feat at any structure)."""
    spec = DATASETS[name]
    pn, mlp = ANCHORS[name]
    C = spec.num_classes
    if mode == "clean":
        rho = 0.0
        oracle_target = max(mlp + ORACLE_FLOOR + 0.005, pn)
        offdiag = spec.offdiag
        s_lo, s_hi = 0.0, 0.97
        result = None
        for it in range(6):
            structure = 0.5 * (s_lo + s_hi)
            p = Payload(name, structure, offdiag, rho)
            sig = _fit_signal(p, mlp)
            f, o = p.measure(sig)
            result = dict(signal=round(sig, 2), structure=round(structure, 3),
                          offdiag=offdiag, label_noise=0.0,
                          feat=round(f, 4), oracle=round(o, 4),
                          h_obs=round(p.h_obs, 3), ceiling=None)
            print(f"  clean it{it}: {result}", flush=True)
            if o < oracle_target:
                s_lo = structure
            else:
                s_hi = structure
        print(f"{name}: {json.dumps(result)}", flush=True)
        return result

    ceiling = min(0.995, pn + CEILING_MARGIN)
    rho = rho_override if rho_override is not None else float(
        np.clip((1.0 - ceiling) / (1.0 - 1.0 / C), 0.0, 0.8))
    structure = max(spec.structure, 0.9)
    offdiag = spec.offdiag
    result = None
    for attempt in range(3):
        p = Payload(name, structure, offdiag, rho)
        sig = _fit_signal(p, mlp)
        f, o = p.measure(sig)
        result = dict(signal=round(sig, 2), structure=structure,
                      offdiag=offdiag, label_noise=round(rho, 3),
                      feat=round(f, 4), oracle=round(o, 4),
                      h_obs=round(p.h_obs, 3), ceiling=round(ceiling, 3))
        print(f"  attempt {attempt}: {result}", flush=True)
        if o - f >= ORACLE_FLOOR:
            break
        # raise the structure knob; switch to the invertible matching
        # pattern as the final escalation
        if structure < 0.97:
            structure = 0.97
        elif offdiag != "matching":
            offdiag = "matching"
        else:
            break
    print(f"{name}: {json.dumps(result)}", flush=True)
    return result


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    mode = "clean" if "--clean" in sys.argv else "noise"
    rho = None
    for a in sys.argv[1:]:
        if a.startswith("--rho="):
            rho = float(a.split("=", 1)[1])
    names = args or list(ANCHORS)
    out = {}
    for name in names:
        print(f"== {name} ({mode})", flush=True)
        out[name] = calibrate(name, mode=mode, rho_override=rho)
    path = "results/calibration_v2.json"
    import os
    prev = json.load(open(path)) if os.path.exists(path) else {}
    prev.update(out)
    with open(path, "w") as f:
        json.dump(prev, f, indent=2)


if __name__ == "__main__":
    main()
