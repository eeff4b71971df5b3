"""Diagnose the cora/Nba PathNet-vs-oracle gap (VERDICT r4 items 2-3).

Runs short protocol variants (rounds x epochs) across a hyperparameter /
architecture grid and prints one line per config, so the gap between our
trained PathNet and the payload's own structure oracle
(results/standin_ceiling.json) can be attributed to optimization,
capacity, aggregation, or sampling.

Usage: python scripts/probe_gap.py cora [rounds] [epochs]
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")


def main():
    from pathnet_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    from pathnet_tpu.config import TrainConfig
    from pathnet_tpu.train import run_protocol

    name = sys.argv[1] if len(sys.argv) > 1 else "cora"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    epochs = int(sys.argv[3]) if len(sys.argv) > 3 else 1000

    grid = [
        ("base", {}),
        ("dr0.5", {"dropout": 0.5}),
        ("dr0.3", {"dropout": 0.3}),
        ("dr0.1", {"dropout": 0.1}),
        ("hid128", {"hidden": 128}),
        ("hid256", {"hidden": 256}),
        ("nw80", {"num_walks": 80}),
        ("agg_mean", {"agg": "mean"}),
        ("rnn_gru", {"rnn": "gru"}),
        ("rnn_mlp", {"rnn": "mlp"}),
        ("uniform", {"kind": "uniform"}),
        ("lr.01", {"cfg": TrainConfig(lr=0.01, epochs=epochs, rounds=rounds)}),
        ("wd0", {"cfg": TrainConfig(weight_decay=0.0, epochs=epochs,
                                    rounds=rounds)}),
        ("dr0.3+hid128", {"dropout": 0.3, "hidden": 128}),
    ]
    out = {}
    for tag, kw in grid:
        cfg = kw.pop("cfg", TrainConfig(epochs=epochs, rounds=rounds))
        t0 = time.time()
        agg, _ = run_protocol(name, cfg=cfg, rounds=rounds, verbose=False,
                              **kw)
        m, s = agg["accuracy"]
        out[tag] = [round(m, 4), round(s, 4)]
        print(f"{name} {tag:>14}: {100*m:.2f} ± {100*s:.2f}  "
              f"[{time.time()-t0:.0f}s]", flush=True)
    with open(f"results/probe_gap_{name}.json", "w") as f:
        json.dump({"dataset": name, "rounds": rounds, "epochs": epochs,
                   "grid": out}, f, indent=2)


if __name__ == "__main__":
    main()
