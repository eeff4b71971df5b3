"""Nba pattern-decode probe (round 5).

The Nba protocol on the calibrated payload has trained PathNet at 63.05 —
exactly the mix-oracle (63.6) and 8 pts under the path-oracle (71.75): the
trained model reads structure but not the pattern channel, unlike bgp
(bit_smooth=1) where trained PathNet *exceeds* its path-oracle.  Hypothesis:
smooth-3 bits + n=403 (≈190 train nodes) make the channel too hard for the
LSTM to learn, even though the plug-in oracle decodes it.

This probe trains short CPU runs (no TPU contention with the round-5 queue)
on payload variants and reports trained PathNet/MLP gaps.  Run:

    JAX_PLATFORMS=cpu python scripts/nba_decode_probe.py
"""
import dataclasses
import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, ".")

import numpy as np

from pathnet_tpu.config import TrainConfig
from pathnet_tpu.data import registry
from pathnet_tpu.train import run_protocol
from pathnet_tpu.data.registry import load_dataset
from pathnet_tpu.models.baselines.zoo import BaselineSpec
from pathnet_tpu.train.baseline_trainer import run_baseline_round

ROUNDS = 3
EPOCHS = 600

VARIANTS = {
    "cur_s3_f45": dict(bit_smooth=3, pattern_frac=0.45),
    "s1_f45": dict(bit_smooth=1, pattern_frac=0.45),
    "s2_f60": dict(bit_smooth=2, pattern_frac=0.60),
}


def run_variant(tag, patch):
    base = registry.DATASETS["Nba"]
    registry.DATASETS["Nba"] = dataclasses.replace(base, **patch)
    try:
        cfg = TrainConfig(epochs=EPOCHS, rounds=ROUNDS, seed=0)
        agg, _ = run_protocol("Nba", data_root="data", cfg=cfg,
                              hidden=256)
        pn_mean, pn_std = agg["accuracy"]
        mlp_accs = []
        for r in range(ROUNDS):
            g, tr, va, te, _ = load_dataset("Nba", "data", r)
            spec = BaselineSpec(name="mlp", feat_dim=g.features.shape[1],
                                hidden=256, out_dim=base.num_classes,
                                dropout=0.7, n_nodes=g.n)
            res = run_baseline_round(g, spec, cfg, tr, va, te,
                                     base.num_classes, seed=r)
            mlp_accs.append(res.metrics["accuracy"])
        out = dict(tag=tag, patch=patch, pathnet=round(pn_mean, 4),
                   pathnet_std=round(pn_std, 4),
                   mlp=round(float(np.mean(mlp_accs)), 4),
                   gap=round(pn_mean - float(np.mean(mlp_accs)), 4))
        print(json.dumps(out), flush=True)
        return out
    finally:
        registry.DATASETS["Nba"] = base


def main():
    outs = [run_variant(t, p) for t, p in VARIANTS.items()]
    with open("results/nba_decode_probe.json", "w") as f:
        json.dump(outs, f, indent=2)


if __name__ == "__main__":
    main()
