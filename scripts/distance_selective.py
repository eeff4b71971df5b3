"""Distance-selective signal experiment (VERDICT r4 #3 companion).

Why: on any *edgewise-Markov* stand-in label field, the observed 1-hop
class mix is a sufficient statistic for the label — so a full-neighborhood
smoothing model (GCN/GAT aggregates EVERY neighbor exactly) upper-bounds a
sampled-path model by construction, and the Nba stand-in cannot reproduce
the reference's PathNet>GAT ordering (results/standin_ceiling.json: Nba
oracle_1hop 74.9 ~= oracle_2hop 75.5 — no path-level headroom).  The real
NBA payload evidently carries signal BEYOND edgewise statistics.  This
experiment constructs exactly that kind of signal on the REAL Nba edge
structure and shows the architecture difference it exposes:

  hidden field z: random classes, feature-visible (x_i ~ centroid[z_i]+noise)
  label y_i = argmax class of z over nodes at EXACT hop distance 2
              (hop-1 z's excluded by construction)

A model must (1) read neighbors' z from features and (2) select exactly
distance-2 nodes.  MEASURED OUTCOME (results/distance_selective.json): the
selection requirement does separate architectures, but in favor of
explicit structured aggregation — h2gcn (strict-2-hop mean) 46.6 > mixhop
42.7 > PathNet-best 38.6 (mean agg, dropout 0) > GAT/GCN ~34 (hop-mixing)
> MLP 26 (chance 25); PathNet at wl=2 (positions reach hop<=1) is at
chance, confirming the distance-conditioned machinery is what lifts
wl>=3.  Together with the pattern synthetic (ablation_pattern.json, where
PathNet's sequential encoder shows the generative-length peak) this
triangulates the regimes: edgewise fields -> smoothing wins; pure
counting -> structured aggregation wins; sequential path patterns ->
path encoders win.

Runs PathNet / mlp / gcn / gat / sage / gin on the task, writes
results/distance_selective.json.

Usage: python scripts/distance_selective.py [rounds] [epochs]
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from pathnet_tpu.utils import enable_compilation_cache

enable_compilation_cache()


def build_task(seed=11, num_classes=4, feat_dim=32, signal=3.0,
               source="sparse"):
    import scipy.sparse as sp

    from pathnet_tpu.data import Graph
    from pathnet_tpu.data.registry import load_structure
    from pathnet_tpu.data.synthetic import synthetic_graph

    if source == "nba":
        # real 403-node structure — measured DEGENERATE for this task: at
        # avg degree ~107 the exact-2-hop set is nearly the whole graph, so
        # y becomes a global argmax (majority ~56%) and every model ties at
        # the majority rate (results/distance_selective_nba.json).  Kept as
        # the negative control.
        g = load_structure("Nba")
    else:
        # sparse graph: |exact-2-hop| ~ deg^2 ~ 25 — local, per-node labels
        g = synthetic_graph(n=2000, avg_deg=5.0, num_classes=2,
                            homophily=0.5, feat_dim=4, seed=13)
    rng = np.random.default_rng(seed)
    z = rng.integers(0, num_classes, size=g.n)
    A = sp.coo_matrix((np.ones(len(g.src)), (g.src, g.dst)),
                      shape=(g.n, g.n)).tocsr()
    A = ((A + A.T) > 0).astype(np.float32)
    A.setdiag(0)
    A.eliminate_zeros()
    A2 = A @ A
    A2.setdiag(0)
    A2 = A2 - A2.multiply(A)          # exact distance-2 reachability
    A2.eliminate_zeros()
    eye = np.eye(num_classes, dtype=np.float32)
    c2 = (A2 > 0).astype(np.float32) @ eye[z]
    gums = rng.gumbel(0, 0.35, size=c2.shape)    # tie-break/label noise
    y = (c2 / np.maximum(c2.sum(1, keepdims=True), 1) + gums * 0.05
         ).argmax(1).astype(np.int64)
    # features expose z only
    cent = rng.normal(0, signal / np.sqrt(2 * feat_dim),
                      size=(num_classes, feat_dim))
    x = rng.normal(0, 1, size=(g.n, feat_dim)).astype(np.float32)
    x += cent[z].astype(np.float32)
    return Graph(n=g.n, src=g.src, dst=g.dst, prob=g.prob, features=x,
                 labels=y, name="Nba_dist2"), num_classes


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    source = "nba" if "--nba" in sys.argv else "sparse"
    rounds = int(args[0]) if len(args) > 0 else 5
    epochs = int(args[1]) if len(args) > 1 else 1000

    import jax.numpy as jnp

    from pathnet_tpu.config import TrainConfig
    from pathnet_tpu.data.splits import get_whole_mask
    from pathnet_tpu.merw import merw_graph_per_component
    from pathnet_tpu.models import PaggSpec
    from pathnet_tpu.models.baselines.zoo import BaselineSpec
    from pathnet_tpu.sample import PathSampler
    from pathnet_tpu.train import run_round, run_baseline_round
    from pathnet_tpu.train.results import aggregate_rounds

    g, C = build_task(source=source)
    cfg = TrainConfig(epochs=epochs, rounds=rounds)
    out = {"task": f"argmax z-class over EXACT hop-2 neighbors, "
                   f"{source} structure (n={g.n})",
           "rounds": rounds, "epochs": epochs, "accuracy": {}}

    gm = merw_graph_per_component(g)
    ps = PathSampler.build(gm, num_walks=40, walk_len=4)
    spec = PaggSpec(feat_dim=g.features.shape[1], hidden=64, out_dim=C,
                    walk_len=4, variant="hetero", dropout=0.3)
    accs = []
    for r in range(rounds):
        tr, va, te = get_whole_mask(g.labels, seed=r + 1)
        res = run_round(jnp.asarray(g.features), jnp.asarray(g.labels), ps,
                        spec, cfg, tr, va, te, num_classes=C, seed=r)
        accs.append(res.metrics["accuracy"])
    out["accuracy"]["PathNet"] = [float(np.mean(accs)), float(np.std(accs))]
    print("PathNet", out["accuracy"]["PathNet"], flush=True)

    for model in ("mlp", "gcn", "gat", "sage", "gin", "mixhop", "h2gcn"):
        results = []
        for r in range(rounds):
            tr, va, te = get_whole_mask(g.labels, seed=r + 1)
            bs = BaselineSpec(name=model, feat_dim=g.features.shape[1],
                              hidden=64, out_dim=C, n_nodes=g.n)
            results.append(run_baseline_round(g, bs, cfg, tr, va, te, C,
                                              seed=r))
        agg = aggregate_rounds(results)
        out["accuracy"][model] = [agg["accuracy"][0], agg["accuracy"][1]]
        print(model, out["accuracy"][model], flush=True)

    suffix = "_nba" if source == "nba" else ""
    with open(f"results/distance_selective{suffix}.json", "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
