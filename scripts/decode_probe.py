"""Generic trained-model decode probe (generalizes nba_decode_probe.py).

Trains short CPU PathNet+MLP runs on pattern-payload variants of a dataset
and reports the trained gap — the selection signal that plug-in oracles
missed on tiny graphs (Nba, cornell), where a channel can be decodable yet
unlearnable from <200 train nodes.

Usage:
    JAX_PLATFORMS=cpu python scripts/decode_probe.py cornell \
        "cur:{}" "s2:{'bit_smooth':2}" "f35s2:{'pattern_frac':0.35,'bit_smooth':2}"
"""
import ast
import dataclasses
import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, ".")

import numpy as np

from pathnet_tpu.config import TrainConfig
from pathnet_tpu.data import registry
from pathnet_tpu.data.registry import load_dataset
from pathnet_tpu.models.baselines.zoo import BaselineSpec
from pathnet_tpu.train import run_protocol
from pathnet_tpu.train.baseline_trainer import run_baseline_round

ROUNDS = int(os.environ.get("PROBE_ROUNDS", "3"))
EPOCHS = int(os.environ.get("PROBE_EPOCHS", "600"))


def run_variant(name, tag, patch, hidden=64):
    base = registry.DATASETS[name]
    registry.DATASETS[name] = dataclasses.replace(base, **patch)
    try:
        cfg = TrainConfig(epochs=EPOCHS, rounds=ROUNDS, seed=0)
        agg, _ = run_protocol(name, data_root="data", cfg=cfg, hidden=hidden,
                              verbose=False)
        mlps = []
        for r in range(ROUNDS):
            g, tr, va, te, _ = load_dataset(name, "data", r)
            spec = BaselineSpec(name="mlp", feat_dim=g.features.shape[1],
                                hidden=hidden, out_dim=base.num_classes,
                                dropout=0.7, n_nodes=g.n)
            mlps.append(run_baseline_round(
                g, spec, cfg, tr, va, te, base.num_classes,
                seed=r).metrics["accuracy"])
        out = dict(tag=tag, patch=patch,
                   pathnet=round(agg["accuracy"][0], 4),
                   pathnet_std=round(agg["accuracy"][1], 4),
                   mlp=round(float(np.mean(mlps)), 4),
                   gap=round(agg["accuracy"][0] - float(np.mean(mlps)), 4))
        print(json.dumps(out), flush=True)
        return out
    finally:
        registry.DATASETS[name] = base


def main():
    name = sys.argv[1]
    outs = []
    for spec in sys.argv[2:]:
        tag, _, patch = spec.partition(":")
        outs.append(run_variant(name, tag, ast.literal_eval(patch or "{}")))
    path = f"results/decode_probe_{name}.json"
    with open(path, "w") as f:
        json.dump({"rounds": ROUNDS, "epochs": EPOCHS, "variants": outs},
                  f, indent=2)
    print("wrote", path)


if __name__ == "__main__":
    main()
