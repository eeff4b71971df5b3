"""Monte-Carlo Bayes probe for the path-pattern synthetic (VERDICT r3 weak #8).

The r3 experiment ran 44-48% flat across walk lengths with no peak at the
generative length 3 — this probe separates the two possible causes:

  (a) information-limited: even a PLUG-IN decoder that sees the true parity
      bits of its sampled walks and histograms them exactly cannot recover
      the label from num_walks sampled random walks (sampling-measure
      mismatch: the label counts every walk once — walk-set uniform — while
      a random walk weights walks by prod(1/deg); plus multinomial noise at
      40 draws);
  (b) model-limited: the plug-in decoder succeeds, so the LSTM+aggregation
      pipeline is failing to learn the histogram-argmax function.

For each walk length wl, the plug-in decoder samples num_walks uniform
random walks per node, maps each to its parity bitmask (truncated to the
wl-step prefix for wl<3; for wl>3 each walk contributes its length-3
prefix mask — what a length-wl path model can reconstruct), and predicts
argmax of the empirical histogram, remapped through the same top-4+other
class collapse as the experiment.  Prints accuracy per wl.

Run: python scripts/pattern_ceiling.py [n] [avg_deg] [num_walks]
"""
from __future__ import annotations

import json
import sys

import numpy as np

sys.path.insert(0, ".")

from pathnet_tpu.data.synthetic import synthetic_graph, path_pattern_labels  # noqa: E402


def build_adj(src, dst, n):
    order = np.argsort(src, kind="stable")
    s, d = src[order], dst[order]
    indptr = np.searchsorted(s, np.arange(n + 1))
    return indptr, d


def sample_walks(indptr, indices, n, num_walks, wl, rng):
    """[n, num_walks, wl] next-hop node ids via uniform RW (self-stay on
    isolated nodes)."""
    walks = np.zeros((n, num_walks, wl), np.int64)
    cur = np.repeat(np.arange(n), num_walks)
    for t in range(wl):
        deg = indptr[cur + 1] - indptr[cur]
        off = (rng.random(len(cur)) * np.maximum(deg, 1)).astype(np.int64)
        nxt = np.where(deg > 0, indices[np.minimum(indptr[cur] + off,
                                                   len(indices) - 1)], cur)
        walks[:, :, t] = nxt.reshape(n, num_walks)
        cur = nxt
    return walks


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    avg_deg = float(sys.argv[2]) if len(sys.argv) > 2 else 4.0
    num_walks = int(sys.argv[3]) if len(sys.argv) > 3 else 40
    base = synthetic_graph(n=n, avg_deg=avg_deg, num_classes=2, feat_dim=8,
                           homophily=0.5, seed=7)
    y_raw = path_pattern_labels(base, walk_len=3)
    uniq, counts = np.unique(y_raw, return_counts=True)
    keep = uniq[np.argsort(counts)[::-1][:4]]
    remap = {int(p): i for i, p in enumerate(keep)}
    y = np.array([remap.get(int(v), len(keep)) for v in y_raw], np.int64)
    C = len(keep) + 1
    print(f"n={n} deg={avg_deg} nw={num_walks} C={C} "
          f"class sizes={np.bincount(y, minlength=C)}")

    indptr, indices = build_adj(base.src, base.dst, n)
    rng = np.random.default_rng(0)
    out = {}
    for wl in (2, 3, 4, 5):
        walks = sample_walks(indptr, indices, n, num_walks, wl, rng)
        par = walks % 2                                   # [n, nw, wl]
        own = (np.arange(n) % 2)[:, None]
        # length-3-prefix mask a length-wl path model can reconstruct
        steps = min(wl, 3)
        mask = np.broadcast_to(own, (n, num_walks)).copy()
        for t in range(steps):
            mask = (mask << 1) | par[:, :, t]
        npat = 1 << (steps + 1)
        hist = np.zeros((n, 16), np.int64)
        for p in range(npat):
            # wl<3: a k-step prefix corresponds to 2^(3-k) full patterns --
            # spread its count uniformly (the plug-in Bayes marginal)
            cnt = (mask == p).sum(axis=1)
            if steps == 3:
                hist[:, p] += cnt
            else:
                span = 1 << (3 - steps)
                for q in range(span):
                    hist[:, (p << (3 - steps)) | q] += cnt
        pred_pat = hist.argmax(axis=1)
        pred = np.array([remap.get(int(v), len(keep)) for v in pred_pat],
                        np.int64)
        acc = float((pred == y).mean())
        out[wl] = acc
        print(f"wl={wl}: plug-in accuracy {acc:.4f}")
    with open("results/pattern_ceiling.json", "w") as f:
        json.dump({"n": n, "avg_deg": avg_deg, "num_walks": num_walks,
                   "plug_in_acc_by_len": out}, f, indent=2)


if __name__ == "__main__":
    main()
