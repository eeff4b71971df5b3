"""Render the paper-style comparison table (performance.jpg analog).

Reads every results/comparison_<dataset>.json and emits one markdown table
— models as rows, datasets as columns, test accuracy mean±std — mirroring
the row structure of the reference's published table
(/root/reference/performance.jpg via README.md:112-114), with the
reference's own numbers in a second block for the datasets it published.

Writes COMPARISON.md and prints it.

Run: python scripts/render_comparison.py
"""
from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, ".")

# performance.jpg row order; ours maps zoo names onto it
ROW_ORDER = [
    ("PathNet", "PathNet"), ("mlp", "MLP"), ("gin", "GIN"), ("gat", "GAT"),
    ("sage", "GraphSage"), ("sage1", "GraphSage (PyG)"),
    ("mixhop", "MixHop"), ("h2gcn", "H2GCN"), ("gprgnn", "GPRGNN"),
    ("fagcn", "FAGCN"), ("gcn", "GCN"), ("sgc", "SGC"),
    ("appnp", "APPNP"), ("cheb", "ChebNet"), ("link", "LINK"),
    ("gcnjk", "GCN-JK"), ("gatjk", "GAT-JK"), ("lp", "LabelProp"),
]
COL_ORDER = ["cora", "pubmed", "citeseer", "cornell", "Nba", "bgp",
             "Electronics", "Dblp", "texas", "wisconsin", "chameleon",
             "squirrel", "film"]

# reference table (performance.jpg) — rows it publishes, % accuracy
REFERENCE = {
    "PathNet": {"cora": "85.76±2.67", "pubmed": "88.92±0.21",
                "citeseer": "77.98±2.40", "cornell": "91.35±2.91",
                "Nba": "71.69±4.83", "bgp": "65.72±0.66",
                "Electronics": "76.97±0.84"},
    "MLP": {"cora": "74.75±2.22", "pubmed": "86.65±0.35",
            "citeseer": "72.41±2.18", "cornell": "81.08±6.37",
            "Nba": "59.21±6.92", "bgp": "63.39±0.34",
            "Electronics": "75.03±0.08"},
    "GIN": {"cora": "84.97±1.51", "pubmed": "86.97±0.53",
            "citeseer": "72.19±1.74", "cornell": "58.10±5.70",
            "Nba": "65.47±6.85", "bgp": "OOM", "Electronics": "OOM"},
    "GAT": {"cora": "82.68±1.80", "pubmed": "84.68±0.44",
            "citeseer": "75.46±1.72", "cornell": "58.92±3.32",
            "Nba": "67.19±1.04", "bgp": "62.25±0.90",
            "Electronics": "64.64±0.27"},
    "GraphSage": {"cora": "86.90±1.04", "pubmed": "88.45±0.50",
                  "citeseer": "76.04±1.30", "cornell": "75.95±5.01",
                  "Nba": "61.70±2.40", "bgp": "61.71±0.85",
                  "Electronics": "74.92±0.19"},
    "MixHop": {"cora": "85.41±1.61", "pubmed": "86.38±0.46",
               "citeseer": "75.43±1.89", "cornell": "72.51±6.36",
               "Nba": "68.89±5.95", "bgp": "64.80±0.83",
               "Electronics": "67.84±0.50"},
    "H2GCN": {"cora": "86.21±0.98", "pubmed": "87.86±0.19",
              "citeseer": "76.73±1.48", "cornell": "81.27±4.63",
              "Nba": "66.67±7.02", "bgp": "65.13±1.01",
              "Electronics": "73.92±0.52"},
    "GPRGNN": {"cora": "86.00±2.46", "pubmed": "86.56±0.29",
               "citeseer": "78.45±0.27", "cornell": "50.82±3.28",
               "Nba": "48.25±4.97", "bgp": "61.49±0.40",
               "Electronics": "75.79±0.16"},
    "FAGCN": {"cora": "86.30±1.74", "pubmed": "88.50±0.27",
              "citeseer": "76.20±1.45", "cornell": "72.70±4.50",
              "Nba": "63.49±3.89", "bgp": "64.48±0.55",
              "Electronics": "71.10±2.02"},
}


def main():
    from pathnet_tpu.data.registry import DATASETS, payload_fingerprint

    tables = {}
    meta = {}
    seeded = {}
    for path in sorted(glob.glob("results/comparison_*.json")):
        d = json.load(open(path))
        name = d["dataset"]
        cur_fp = (payload_fingerprint(DATASETS[name])
                  if name in DATASETS else None)
        stale = d.get("payload") != cur_fp
        tables[name] = d.get("accuracy", {})
        meta[name] = (d.get("platform"), d.get("rounds"), d.get("epochs"),
                      d.get("payload"),
                      "STALE-PAYLOAD" if stale else "current")
        if d.get("seeded"):
            seeded[name] = d["seeded"]

    cols = [c for c in COL_ORDER if c in tables]
    out = ["# COMPARISON — PathNet + baseline zoo, test accuracy % "
           "(mean ± std)", "",
           "Our framework on TPU, calibrated synthetic stand-in payloads "
           "(real payloads absent upstream — see RESULTS.md).  Protocol: "
           "best-on-validation model selection, per-dataset splits as in "
           "the reference (PathNet_run.py:437-474).  Reference block: the "
           "paper's published table (performance.jpg) on the real "
           "payloads — directional reading only.", ""]
    hdr = "| model | " + " | ".join(cols) + " |"
    sep = "|---" * (len(cols) + 1) + "|"
    out += [hdr, sep]
    for key, label in ROW_ORDER:
        cells = []
        for c in cols:
            v = tables[c].get(key) or tables[c].get(label)
            cells.append(f"{100*v[0]:.2f}±{100*v[1]:.2f}" if v else "—")
        out.append(f"| {label} | " + " | ".join(cells) + " |")
    out += ["", "Run meta (platform, rounds, epochs, payload fingerprint): "
            + ", ".join(f"{c}={meta[c]}" for c in cols), ""]
    if seeded:
        out += ["PathNet/MLP rows seeded from full-protocol runs (their own "
                "config, per-dataset reference settings): " + "; ".join(
                    f"{c}: " + ", ".join(
                        f"{m}(hid={v.get('hidden_size')},dr={v.get('dropout')}"
                        f",dtype={v.get('dtype')},r={v.get('round')})"
                        for m, v in s.items())
                    for c, s in sorted(seeded.items())), ""]

    ref_cols = [c for c in COL_ORDER if any(c in r for r in
                                            REFERENCE.values())]
    out += ["## Reference (performance.jpg, real payloads, 1x CUDA GPU)", "",
            "| model | " + " | ".join(ref_cols) + " |",
            "|---" * (len(ref_cols) + 1) + "|"]
    for label in ("PathNet", "MLP", "GIN", "GAT", "GraphSage", "MixHop",
                  "H2GCN", "GPRGNN", "FAGCN"):
        row = REFERENCE[label]
        out.append(f"| {label} | " + " | ".join(
            row.get(c, "—") for c in ref_cols) + " |")
    out.append("")
    text = "\n".join(out)
    with open("COMPARISON.md", "w") as f:
        f.write(text + "\n")
    print(text)


if __name__ == "__main__":
    main()
