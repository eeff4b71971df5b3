"""Figure generation — the reference's draw_figs/ analog (VERDICT r2 #6/#8).

Reads the committed result artifacts and emits:
  figs/ablation_length.png — walk-length ablation curves per dataset
      (reference: draw_figs/length.py; its numbers at :49-53)
  figs/comparison.png — PathNet vs MLP vs best GNN baseline per dataset
      (the headline claim of performance.jpg: PathNet wins under
      heterophily, MLP is the feature-only floor)

Design notes: fixed-order categorical palette (validated adjacent-pairlist
order from the dataviz reference palette — slots are never cycled), single
y-axis, legend always present for >=2 series, recessive grid, thin marks,
error bars as 1-sigma whiskers.  Static PNG export (no hover layer).

Run: python scripts/draw_figs.py
"""
from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, ".")

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

# dataviz reference palette, categorical slots in fixed order (light mode);
# documented as passing the adjacent-pairlist CVD/normal-vision floors
PALETTE = ["#2a78d6", "#eb6834", "#1baf7a", "#eda100", "#e87ba4",
           "#008300", "#4a3aa7", "#e34948"]
SURFACE = "#fcfcfb"
TEXT1, TEXT2 = "#0b0b0b", "#52514e"

REF_LENGTH = {  # draw_figs/length.py:49-53 (accuracy %)
    "cora": [84.30, 86.67, 85.54, 84.50],
    "pubmed": [87.87, 87.91, 88.92, 86.93],
    "citeseer": [78.48, 78.86, 78.71, 77.22],
    "cornell": [90.00, 91.62, 92.43, 90.38],
    "Nba": [69.89, 72.79, 71.00, 69.10],
    "bgp": [64.30, 65.04, 65.72, 64.59],
    "Electronics": [76.70, 77.02, 77.84, 76.67],
}


def style_axes(ax):
    ax.set_facecolor(SURFACE)
    for spine in ("top", "right"):
        ax.spines[spine].set_visible(False)
    for spine in ("left", "bottom"):
        ax.spines[spine].set_color("#d8d7d2")
    ax.grid(axis="y", color="#e8e7e2", linewidth=0.8, zorder=0)
    ax.tick_params(colors=TEXT2, labelsize=9)


def fig_ablation():
    files = sorted(glob.glob("results/ablation_length_*.json"))
    if not files:
        print("no ablation artifacts; skipping ablation figure")
        return
    fig, axes = plt.subplots(1, 2, figsize=(11, 4.2), facecolor=SURFACE)
    for ax, (title, source) in zip(axes, [
            ("ours (stand-in payloads)", "ours"),
            ("reference (real payloads, draw_figs/length.py)", "ref")]):
        style_axes(ax)
        if source == "ours":
            series = []
            for f in files:
                d = json.load(open(f))
                lens = sorted(int(k) for k in d["accuracy_by_len"])
                m = [100 * d["accuracy_by_len"][str(l)][0] for l in lens]
                s = [100 * d["accuracy_by_len"][str(l)][1] for l in lens]
                series.append((d["dataset"], lens, m, s))
        else:
            series = [(k, [2, 3, 4, 5], v, None)
                      for k, v in REF_LENGTH.items()]
        # fixed dataset->slot mapping shared by both panels
        names = sorted({nm for nm, *_ in series}
                       | set(REF_LENGTH)) if source == "ref" else None
        order = {}
        all_names = sorted({nm for nm, *_ in series} | set(REF_LENGTH))
        for i, nm in enumerate(all_names):
            order[nm] = PALETTE[i % len(PALETTE)]
        for nm, lens, m, s in series:
            c = order[nm]
            ax.plot(lens, m, color=c, linewidth=2, marker="o",
                    markersize=4.5, label=nm, zorder=3)
            if s is not None:
                ax.errorbar(lens, m, yerr=s, fmt="none", ecolor=c,
                            elinewidth=1, capsize=2, alpha=0.5, zorder=2)
        ax.set_title(title, color=TEXT1, fontsize=10)
        ax.set_xlabel("walk length", color=TEXT2, fontsize=9)
        ax.set_xticks([2, 3, 4, 5])
        ax.set_ylabel("test accuracy (%)", color=TEXT2, fontsize=9)
        ax.legend(fontsize=7.5, frameon=False, ncol=2, labelcolor=TEXT2)
    fig.suptitle("Walk-length ablation (10-round protocol)", color=TEXT1,
                 fontsize=12)
    fig.tight_layout()
    os.makedirs("figs", exist_ok=True)
    fig.savefig("figs/ablation_length.png", dpi=150,
                facecolor=SURFACE, bbox_inches="tight")
    print("wrote figs/ablation_length.png")


def fig_comparison():
    rows = {}
    for f in sorted(glob.glob("results/comparison_*.json")):
        d = json.load(open(f))
        acc = d.get("accuracy", {})
        if "PathNet" not in acc or "mlp" not in acc:
            continue
        gnn = {k: v for k, v in acc.items() if k not in ("PathNet", "mlp",
                                                         "lp", "link")}
        if not gnn:
            continue
        best_name, best = max(gnn.items(), key=lambda kv: kv[1][0])
        rows[d["dataset"]] = (acc["PathNet"], acc["mlp"],
                              (best_name, best))
    if not rows:
        print("no comparison artifacts; skipping comparison figure")
        return
    names = sorted(rows)
    import numpy as np
    xs = np.arange(len(names))
    w = 0.26
    fig, ax = plt.subplots(figsize=(max(7, 1.1 * len(names)), 4.4),
                           facecolor=SURFACE)
    style_axes(ax)
    for i, (label, idx) in enumerate([("PathNet (ours)", 0), ("MLP", 1)]):
        m = [100 * rows[n][idx][0] for n in names]
        s = [100 * rows[n][idx][1] for n in names]
        ax.bar(xs + (i - 1) * w, m, w * 0.92, yerr=s, color=PALETTE[i],
               error_kw=dict(ecolor=TEXT2, elinewidth=1, capsize=2),
               label=label, zorder=3)
    m = [100 * rows[n][2][1][0] for n in names]
    s = [100 * rows[n][2][1][1] for n in names]
    ax.bar(xs + w, m, w * 0.92, yerr=s, color=PALETTE[2],
           error_kw=dict(ecolor=TEXT2, elinewidth=1, capsize=2),
           label="best GNN baseline", zorder=3)
    for x, n in zip(xs, names):
        ax.annotate(rows[n][2][0], (x + w, 100 * rows[n][2][1][0]),
                    textcoords="offset points", xytext=(0, 4),
                    ha="center", fontsize=6.5, color=TEXT2)
    ax.set_xticks(xs)
    ax.set_xticklabels(names, rotation=30, ha="right", color=TEXT1,
                       fontsize=9)
    ax.set_ylabel("test accuracy (%)", color=TEXT2, fontsize=9)
    ax.set_title("Comparison-table headline: PathNet vs feature floor vs "
                 "best GNN baseline (stand-in payloads)", color=TEXT1,
                 fontsize=11)
    ax.legend(fontsize=8.5, frameon=False, labelcolor=TEXT2)
    fig.tight_layout()
    os.makedirs("figs", exist_ok=True)
    fig.savefig("figs/comparison.png", dpi=150, facecolor=SURFACE,
                bbox_inches="tight")
    print("wrote figs/comparison.png")


def fig_pattern():
    """Path-pattern synthetic: trained curve vs plug-in Bayes ceiling
    (gen_cora_syn semantics; the mechanism behind the reference's
    peak-at-3 length ablation, isolated)."""
    try:
        trained = json.load(open("results/ablation_pattern.json"))
        ceiling = json.load(open("results/pattern_ceiling.json"))
    except Exception:
        print("pattern artifacts incomplete; skipping pattern figure")
        return
    if "num_walks" not in trained:          # r3-era artifact
        print("pattern artifact is pre-r4; skipping pattern figure")
        return
    fig, ax = plt.subplots(figsize=(5.6, 4.2), facecolor=SURFACE)
    style_axes(ax)
    lens = sorted(int(k) for k in trained["lengths"])
    m = [100 * trained["lengths"][str(l)]["mean"] for l in lens]
    s = [100 * trained["lengths"][str(l)]["std"] for l in lens]
    ax.plot(lens, m, color=PALETTE[0], linewidth=2, marker="o",
            markersize=4.5, label="PathNet (sum agg, trained)", zorder=3)
    ax.errorbar(lens, m, yerr=s, fmt="none", ecolor=PALETTE[0],
                elinewidth=1, capsize=2, alpha=0.5, zorder=2)
    cl = sorted(int(k) for k in ceiling["plug_in_acc_by_len"])
    cm = [100 * ceiling["plug_in_acc_by_len"][str(l)] for l in cl]
    ax.plot(cl, cm, color=PALETTE[1], linewidth=1.6, marker="s",
            markersize=4, linestyle="--",
            label="plug-in Bayes decoder (same #walks)", zorder=3)
    ax.axvline(3, color="#d8d7d2", linewidth=1, zorder=1)
    ax.annotate("generative length", (3, ax.get_ylim()[0] + 1),
                fontsize=7.5, color=TEXT2, ha="center")
    ax.set_xticks([2, 3, 4, 5])
    ax.set_xlabel("model walk length", color=TEXT2, fontsize=9)
    ax.set_ylabel("test accuracy (%)", color=TEXT2, fontsize=9)
    ax.set_title("Path-pattern synthetic (gen_cora_syn semantics)",
                 color=TEXT1, fontsize=10.5)
    ax.legend(fontsize=8, frameon=False, labelcolor=TEXT2)
    fig.tight_layout()
    os.makedirs("figs", exist_ok=True)
    fig.savefig("figs/ablation_pattern.png", dpi=150, facecolor=SURFACE,
                bbox_inches="tight")
    print("wrote figs/ablation_pattern.png")


if __name__ == "__main__":
    fig_ablation()
    fig_comparison()
    fig_pattern()
