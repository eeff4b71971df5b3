"""Hyperparameter sweep harness — the Mixhop ``experiments/*.sh`` analog.

The reference's large-scale-benchmark suite sweeps each model over a grid
of (lr, hidden, weight_decay, dropout, ...) via 12 shell scripts
(baseline/Mixhop/experiments/gcn_exp.sh etc.), one training process per
point.  Here a sweep is one process: every grid point reuses the jitted
round function from the compilation cache (same shapes → compile once),
and results stream to a JSONL file that survives interruption.

Usage:
    python scripts/sweep.py cornell --model pathnet \\
        --lr 0.01,0.005,0.001 --hidden 32,64,128 --dropout 0.5,0.7 \\
        [--rounds 5] [--epochs 500] [--cpu]

    python scripts/sweep.py cornell --model gcn --lr 0.01,0.001 ...

Output: results/sweep_<dataset>_<model>.jsonl, one row per grid point with
mean±std accuracy and the full point config; prints a ranked summary.
"""
from __future__ import annotations

import argparse
import itertools
import json
import os
import sys
import time

sys.path.insert(0, ".")


def parse_grid(s: str, typ=float) -> list:
    return [typ(tok) for tok in s.split(",")]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("dataset")
    ap.add_argument("--model", default="pathnet")
    ap.add_argument("--lr", default="0.005")
    ap.add_argument("--hidden", default="64")
    ap.add_argument("--dropout", default="0.7")
    ap.add_argument("--weight-decay", default="0.0005")
    ap.add_argument("--num-walks", default="40")
    ap.add_argument("--walk-len", default="4")
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--epochs", type=int, default=500)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    from pathnet_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from pathnet_tpu.config import TrainConfig
    from pathnet_tpu.data.registry import DATASETS, load_dataset
    from pathnet_tpu.train import run_protocol
    from pathnet_tpu.train.results import aggregate_rounds

    grid = list(itertools.product(
        parse_grid(args.lr), parse_grid(args.hidden, int),
        parse_grid(args.dropout), parse_grid(args.weight_decay),
        parse_grid(args.num_walks, int), parse_grid(args.walk_len, int)))
    os.makedirs("results", exist_ok=True)
    out_path = f"results/sweep_{args.dataset}_{args.model}.jsonl"
    done = set()
    if os.path.exists(out_path):
        with open(out_path) as f:
            for line in f:
                rec = json.loads(line)
                done.add(tuple(rec["point"]))

    spec_d = DATASETS[args.dataset]
    ranked = []
    for point in grid:
        if point in done:
            continue
        lr, hid, dr, wd, nw, wl = point
        cfg = TrainConfig(lr=lr, weight_decay=wd, epochs=args.epochs,
                          rounds=args.rounds)
        t0 = time.time()
        if args.model == "pathnet":
            agg, _ = run_protocol(args.dataset, cfg=cfg, num_walks=nw,
                                  walk_len=wl, hidden=hid, dropout=dr,
                                  verbose=False)
        else:
            from pathnet_tpu.models.baselines.zoo import BaselineSpec
            from pathnet_tpu.train import run_baseline_round

            results = []
            for r in range(args.rounds):
                g, tr, va, te, _ = load_dataset(args.dataset, "data", r)
                bspec = BaselineSpec(name=args.model,
                                     feat_dim=g.features.shape[1],
                                     hidden=hid, out_dim=spec_d.num_classes,
                                     n_nodes=g.n, dropout=dr)
                results.append(run_baseline_round(
                    g, bspec, cfg, tr, va, te, spec_d.num_classes, seed=r))
            agg = aggregate_rounds(results)
        m, s = agg["accuracy"]
        rec = {"dataset": args.dataset, "model": args.model,
               "point": list(point),
               "config": {"lr": lr, "hidden": hid, "dropout": dr,
                          "weight_decay": wd, "num_walks": nw,
                          "walk_len": wl, "rounds": args.rounds,
                          "epochs": args.epochs},
               "accuracy": [m, s], "seconds": time.time() - t0,
               "ts": time.time()}
        with open(out_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        ranked.append((m, s, point))
        print(f"lr={lr} hid={hid} dr={dr} wd={wd} nw={nw} wl={wl}: "
              f"{100 * m:.2f} ± {100 * s:.2f}  ({rec['seconds']:.0f}s)",
              flush=True)

    ranked.sort(reverse=True)
    print(f"\n=== top points ({args.dataset}/{args.model}) ===")
    for m, s, point in ranked[:5]:
        print(f"{100 * m:6.2f} ± {100 * s:.2f}  "
              f"(lr, hid, dr, wd, nw, wl) = {point}")


if __name__ == "__main__":
    main()
