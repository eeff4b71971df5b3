"""Pattern-channel recalibration of the heterophily stand-ins (round 5).

VERDICT r4 weak #1 / next #1: the r4 payloads are edgewise-Markov fields, on
which full-neighborhood smoothing provably upper-bounds sampled-path models —
so bgp/Dblp had PathNet <= MLP and no stand-in could reproduce the
reference's flagship ordering (performance.jpg: PathNet > MLP on all 7).
The fix, proven by results/ablation_pattern.json, is sequential walk-pattern
signal.  This script calibrates the ``pattern_frac`` knob
(synthetic.apply_pattern_channel) jointly with ``signal`` so that, measured
with scripts/probes.py:

  feat                       ~ documented MLP row
  mix-oracle (1/2-hop)       = what smoothing models can reach
  path-oracle (+walk hist)   >= mix-oracle + ~2x the documented PathNet-MLP
                               gap (headroom for an imperfect learner)

Knob search: pattern_frac from the gap target via the measured per-node
decodability; bit_smooth raised when high-degree averaging kills margins.
Prints a registry patch table; verified by scripts/standin_ceiling.py.

Run: python scripts/calibrate_v3.py [names...] [--frac=0.x] [--smooth=k]
"""
from __future__ import annotations

import json
import sys

import numpy as np

sys.path.insert(0, ".")

from pathnet_tpu.data.registry import DATASETS  # noqa: E402
from pathnet_tpu.data.synthetic import (PATTERN_BIT_AMP, PATTERN_STEPS,  # noqa: E402
                                        edge_homophily, graph_bits,
                                        pattern_blend, walk_pattern_dist)
from calibrate_v2 import ANCHORS, Payload, _fit_signal, masks_for  # noqa: E402
from probes import (centroid_scores, logistic_probe, neighbor_mixes,  # noqa: E402
                    path_oracle_probe, sample_walk_pattern_hist)


class PatternPayload(Payload):
    """Payload with the walk-pattern channel planted (mirrors the registry's
    generation exactly: same seeds, same order — flips first, then blend)."""

    def __init__(self, name, structure, offdiag, label_noise, pattern_frac,
                 bit_smooth, balance=None):
        rho_eff = pattern_frac + (1.0 - pattern_frac) * label_noise
        super().__init__(name, structure, offdiag, label_noise,
                         rho_eff=rho_eff)
        spec = self.spec
        self.pattern_frac = pattern_frac
        self.bits = graph_bits(self.src, self.dst, self.n, self.seed + 3,
                               smooth=bit_smooth)
        q = walk_pattern_dist(self.src, self.dst, self.n, self.bits,
                              steps=PATTERN_STEPS,
                              prob=getattr(self, "prob", None))
        self.y_obs, self.S = pattern_blend(
            self.y_obs, q, spec.num_classes, pattern_frac, self.seed + 4,
            balance=balance if balance is not None else spec.pattern_balance)
        self.h_obs = edge_homophily(self.src, self.dst, self.y_obs)
        self.n1, self.n2 = neighbor_mixes(self.src, self.dst, self.n,
                                          self.y_obs, spec.num_classes)
        self.hist = sample_walk_pattern_hist(self.src, self.dst, self.n,
                                             self.bits, num_walks=40,
                                             steps=PATTERN_STEPS,
                                             seed=self.seed + 5,
                                             prob=getattr(self, "prob", None))

    def features(self, signal):
        from pathnet_tpu.data.synthetic import PATTERN_MARK_AMP
        x = super().features(signal)
        x[:, -1] += PATTERN_BIT_AMP * (2.0 * self.bits - 1.0)
        x[:, -2] += PATTERN_MARK_AMP * (2.0 * self.S.astype(np.float32) - 1.0)
        return x

    def measure_feat(self, signal, rounds=3):
        """feat probe only — the signal bisect doesn't need the oracle
        probes (Electronics at 8669 dims: 3x cheaper fits)."""
        X = self.features(signal)
        C = self.spec.num_classes
        fa = []
        for r in range(rounds):
            tr, va, te = masks_for(self.spec, self.y_obs, r)
            s = centroid_scores(X, self.y_obs, tr, C)
            fa.append(logistic_probe(s, self.y_obs, tr, va, te, C))
        return float(np.mean(fa))

    def measure3(self, signal, rounds=None):
        """(feat, mix_oracle, path_oracle) means over rounds."""
        if rounds is None:
            rounds = 6 if self.n <= 1500 else 3
        X = self.features(signal)
        C = self.spec.num_classes
        fa, oa, pa = [], [], []
        for r in range(rounds):
            tr, va, te = masks_for(self.spec, self.y_obs, r)
            s = centroid_scores(X, self.y_obs, tr, C)
            f = logistic_probe(s, self.y_obs, tr, va, te, C)
            F = np.hstack([s, self.n1.astype(np.float32) * 3.0,
                           self.n2.astype(np.float32) * 3.0])
            o = logistic_probe(F, self.y_obs, tr, va, te, C)
            p = path_oracle_probe(X, self.y_obs, tr, va, te, C,
                                  self.n1, self.n2, self.hist)
            fa.append(f)
            oa.append(max(o, f))
            pa.append(max(p, o, f))
        return (float(np.mean(fa)), float(np.mean(oa)), float(np.mean(pa)))


# best structure baseline of the documented tables (performance.jpg): the
# path-only headroom target is what PathNet clears over the best *GNN*, not
# over MLP — most of the PathNet−MLP gap is structure signal that smoothing
# models read too (mix_oracle − feat covers that part)
BEST_GNN = {"Nba": 0.6719, "bgp": 0.6513, "Electronics": 0.7579,
            "Dblp": 0.71,
            # remaining heterophily family: best GNN of the documented table
            # (cornell: H2GCN 81.27, performance.jpg); where the PathNet
            # anchor IS the era's best GNN (texas/wisconsin/film/squirrel/
            # chameleon, H2GCN-paper numbers), the floor target applies
            "cornell": 0.8127, "texas": 0.8486, "wisconsin": 0.8667,
            "film": 0.37, "squirrel": 0.365, "chameleon": 0.594}


def calibrate(name, frac_override=None, smooth_override=None):
    spec = DATASETS[name]
    pn, mlp = ANCHORS[name]
    bg = BEST_GNN.get(name, mlp)
    # headroom target: 2x the documented PathNet-over-best-GNN edge (an
    # imperfect learner captures a fraction of the plug-in oracle), floored
    # at 4.5 pts and capped at 10
    gap_target = float(np.clip(2.0 * (pn - bg), 0.045, 0.10))
    rho = spec.label_noise
    structure, offdiag = spec.structure, spec.offdiag
    bit_smooth = smooth_override if smooth_override is not None else max(
        1, spec.bit_smooth)
    # initial guess: headroom per pattern node ~ 0.55 (decodability minus
    # the labels' prior readability)
    frac = frac_override if frac_override is not None else min(
        0.45, gap_target / 0.55)
    best = None
    for it in range(4):
        p = PatternPayload(name, structure, offdiag, rho, frac, bit_smooth)
        sig = _fit_signal(p, mlp)
        f, o, po = p.measure3(sig)
        res = dict(signal=round(sig, 2), structure=structure, offdiag=offdiag,
                   label_noise=rho, pattern_frac=round(frac, 3),
                   bit_smooth=bit_smooth, feat=round(f, 4),
                   mix_oracle=round(o, 4), path_oracle=round(po, 4),
                   path_headroom=round(po - o, 4),
                   gap_target=round(gap_target, 4),
                   h_obs=round(p.h_obs, 3))
        print(f"  it{it}: {json.dumps(res)}", flush=True)
        if best is None or abs(res["path_headroom"] - gap_target) < abs(
                best["path_headroom"] - gap_target):
            best = res
        err = res["path_headroom"] - gap_target
        if frac_override is not None or abs(err) < 0.015:
            break
        if res["path_headroom"] < 0.01 and it == 0 and bit_smooth < 3:
            # margins too thin to decode — widen them before scaling frac
            bit_smooth += 2
            continue
        # per-node headroom observed; rescale frac toward the target
        per_node = max(res["path_headroom"] / max(frac, 1e-6), 0.1)
        frac = float(np.clip(gap_target / per_node, 0.02, 0.45))
    print(f"{name}: {json.dumps(best)}", flush=True)
    return best


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    frac = smooth = None
    for a in sys.argv[1:]:
        if a.startswith("--frac="):
            frac = float(a.split("=", 1)[1])
        if a.startswith("--smooth="):
            smooth = int(a.split("=", 1)[1])
    names = args or ["Nba", "bgp", "Electronics", "Dblp"]
    out = {}
    for name in names:
        print(f"== {name}", flush=True)
        out[name] = calibrate(name, frac, smooth)
    import os
    path = "results/calibration_v3.json"
    prev = json.load(open(path)) if os.path.exists(path) else {}
    prev.update(out)
    with open(path, "w") as f:
        json.dump(prev, f, indent=2)


if __name__ == "__main__":
    main()
