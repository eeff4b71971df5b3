"""Run the full reference protocol (10 rounds x 1000 epochs) on TPU.

Per-dataset hyperparameters follow the reference's checked-in run configs
(results/result_for_*.txt: cornell hid=64, Nba hid=256, Electronics hid=32;
others use the CLI defaults).  Each dataset appends a reference-format
result line + JSONL row via the normal CLI path, so the committed artifacts
are exactly what `python -m pathnet_tpu.run` produces.

    python scripts/run_protocol_all.py [names...] [--epochs E] [--rounds R]
"""
from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

# (hidden, microbatch) per reference configs + HBM limits
HYPERS = {
    "cornell": dict(hid=64),
    "cora": dict(hid=64),
    "citeseer": dict(hid=64),
    "pubmed": dict(hid=64, microbatch=8192),
    "Nba": dict(hid=256),
    "bgp": dict(hid=64, microbatch=8192),
    "Electronics": dict(hid=32, microbatch=4096),
    "Dblp": dict(hid=64, microbatch=8192),
    "texas": dict(hid=64),
    "wisconsin": dict(hid=64),
    "chameleon": dict(hid=64),
    "film": dict(hid=64),
    "squirrel": dict(hid=64),
}
DEFAULT_ORDER = ["cornell", "texas", "wisconsin", "Nba", "cora", "citeseer",
                 "chameleon", "film", "squirrel", "Dblp", "pubmed",
                 "Electronics", "bgp"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", default=None)
    ap.add_argument("--epochs", type=int, default=1000)
    ap.add_argument("--rounds", type=int, default=10)
    ap.add_argument("--microbatch", type=int, default=None)
    ap.add_argument("--remat", type=str, default=None)
    args = ap.parse_args()
    names = args.names or DEFAULT_ORDER

    from pathnet_tpu.run import main as run_main

    summary = {}
    for name in names:
        h = HYPERS.get(name, {})
        cli = ["-data", name, "-e", str(args.epochs), "-r", str(args.rounds),
               "-hid", str(h.get("hid", 64))]
        mb = args.microbatch or h.get("microbatch")
        if mb:
            cli += ["--microbatch", str(mb)]
        if args.remat:
            cli += ["--remat", args.remat]
        t0 = time.time()
        try:
            run_main(cli)
            summary[name] = {"ok": True, "seconds": time.time() - t0}
        except Exception as e:  # keep going; record the failure
            summary[name] = {"ok": False, "error": repr(e)[:300],
                             "seconds": time.time() - t0}
        print(f"== {name}: {summary[name]}", flush=True)
        with open("results/protocol_all_status.json", "w") as f:
            json.dump(summary, f, indent=2)


if __name__ == "__main__":
    main()
