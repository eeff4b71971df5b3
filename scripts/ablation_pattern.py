"""Walk-length ablation on the paper's synthetic path-pattern task.

The calibrated accuracy stand-ins are nearly walk-length-flat (their label
fields are 1-hop compatibility structure — results/ablation_length_cornell
.json), so they cannot reproduce the reference's length ablation shape
(draw_figs/length.py:49-53, peak at 3-4).  This experiment uses the
reference's OWN synthetic construction instead (gen_cora_syn.cpp semantics,
`data/synthetic.py:path_pattern_labels`): node labels are the argmax
bitmask of parity features along all length-3 walks.  Features expose only
each node's parity bit (+noise), so the label is recoverable ONLY by
aggregating walks of length >= 3 — a model with walk_len=2 is structurally
blind to it.  Expected shape: sharp rise at walk_len 3, flat/slight decline
after — the mechanism behind the reference's peak, isolated.

Runs on the default backend (TPU when available; --cpu forces CPU —
at n=2000/nw=80 a CPU run is hours while TPU is seconds per length).
Writes results/ablation_pattern.json incrementally (resumable per length).
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pathnet_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from pathnet_tpu.config import TrainConfig
from pathnet_tpu.data import Graph
from pathnet_tpu.data.synthetic import synthetic_graph, path_pattern_labels
from pathnet_tpu.data.splits import get_whole_mask
from pathnet_tpu.models import PaggSpec
from pathnet_tpu.sample import PathSampler
from pathnet_tpu.train import run_round


def main():
    # r4: n=400/nw=40 was doubly limited — the plug-in Bayes decoder itself
    # only reaches 0.645 at wl=3 (multinomial noise at 40 walks) and 192
    # train nodes cannot teach the histogram-argmax function.  At n=2000 /
    # nw=80 the plug-in curve is 0.50 (wl=2) -> 0.72 (wl=3) -> ~0.71
    # (scripts/pattern_ceiling.py, results/pattern_ceiling.json): a sharp
    # rise at the generative length, the reference ablation's shape
    # isolated.  The trained model is compared against that ceiling.
    n, avg_deg, rounds, epochs = 2000, 4.0, 3, 800
    num_walks = 80
    base = synthetic_graph(n=n, avg_deg=avg_deg, num_classes=2, feat_dim=8,
                           homophily=0.5, seed=7)
    y = path_pattern_labels(base, walk_len=3)
    # collapse rare patterns so classes are learnable (reference keeps all
    # 16; tiny graphs leave most empty)
    uniq, counts = np.unique(y, return_counts=True)
    keep = uniq[np.argsort(counts)[::-1][:4]]
    remap = {int(p): i for i, p in enumerate(keep)}
    y = np.array([remap.get(int(v), len(keep)) for v in y], np.int64)
    C = len(keep) + 1
    rng = np.random.default_rng(0)
    # features: the node's OWN parity bit + noise — the walk patterns that
    # define the label are invisible without path aggregation
    x = np.concatenate([(np.arange(n) % 2)[:, None].astype(np.float32),
                        rng.normal(0, 1, (n, 7)).astype(np.float32)], 1)
    g = Graph(n=n, src=base.src, dst=base.dst, prob=base.prob,
              features=x, labels=y, name="path_pattern")

    out = {"n": n, "avg_deg": avg_deg, "num_classes": int(C),
           "rounds": rounds, "epochs": epochs, "num_walks": num_walks,
           "agg": "sum", "lengths": {}}
    out_path = "results/ablation_pattern.json"
    import os
    if os.path.exists(out_path):
        prev = json.load(open(out_path))
        if all(prev.get(k) == out[k] for k in
               ("n", "num_walks", "rounds", "epochs")):
            out["lengths"] = prev.get("lengths", {})
    for wl in (2, 3, 4, 5):
        if str(wl) in out["lengths"] or wl in out["lengths"]:
            continue
        ps = PathSampler.build(g, num_walks=num_walks, walk_len=wl,
                               kind="uniform")
        # sum aggregation: the label is the argmax of a walk-pattern
        # HISTOGRAM — a sum over per-walk pattern detectors is the natural
        # parameterization (the paper's PathNet-Sum ablation row)
        spec = PaggSpec(feat_dim=8, hidden=64, out_dim=C, walk_len=wl,
                        variant="hetero", agg="sum", dropout=0.3)
        cfg = TrainConfig(epochs=epochs, rounds=rounds)
        accs = []
        for r in range(rounds):
            tr, va, te = get_whole_mask(y, seed=r + 1)
            res = run_round(jnp.asarray(x), jnp.asarray(y), ps, spec, cfg,
                            tr, va, te, num_classes=C, seed=r)
            accs.append(res.metrics["accuracy"])
        out["lengths"][wl] = {"mean": float(np.mean(accs)),
                              "std": float(np.std(accs))}
        print(f"wl={wl}: {np.mean(accs):.4f} +/- {np.std(accs):.4f}",
              flush=True)
        with open(out_path, "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
