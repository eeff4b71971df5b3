"""Host-CPU reference path sampler — the baseline for bench.py.

A numpy-vectorized equivalent of the reference's offline C++ sampler
(gen_epoch_merw.cpp): per-epoch alias rolls for n*num_walks walkers over
walk_len steps, plus distance gather from a host table.  This is the
"PyG/CPU-reference reimplementation" scale anchor named in BASELINE.md —
numpy-vectorized rolls are substantially faster than the reference's
printf-bound single-thread C++ loop, so it is a conservative baseline.

Usage: python scripts/cpu_reference.py [n] [avg_deg] [epochs]
Prints paths/s.
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from pathnet_tpu.data import synthetic_graph  # noqa: E402
from pathnet_tpu.sample.alias import build_alias_tables  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 63977
    avg_deg = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0
    epochs = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    nw, wl = 40, 4

    g = synthetic_graph(n=n, avg_deg=avg_deg, num_classes=8, homophily=0.37,
                        feat_dim=8, seed=42)
    nbr, prob, deg = g.padded_csr()
    t0 = time.time()
    lo, hi, split = build_alias_tables(nbr, prob, deg)
    print(f"alias build: {time.time() - t0:.2f}s (max_deg={nbr.shape[1]})")

    D = nbr.shape[1]
    lo_f, hi_f, sp_f = lo.reshape(-1), hi.reshape(-1), split.reshape(-1)
    rng = np.random.default_rng(0)
    W = n * nw

    t0 = time.time()
    for e in range(epochs):
        cur = np.repeat(np.arange(n, dtype=np.int32), nw)
        out = np.empty((wl, W), np.int32)
        out[0] = cur
        for step in range(wl - 1):
            d = np.maximum(deg[cur], 1)
            slot = np.minimum((rng.random(W) * d).astype(np.int32), d - 1)
            flat = cur * D + slot
            take_hi = rng.random(W) >= sp_f[flat]
            cur = np.where(take_hi, hi_f[flat], lo_f[flat])
            out[step + 1] = cur
    dt = time.time() - t0
    pps = epochs * W / dt
    print(f"cpu reference: {pps:,.0f} paths/s  ({dt / epochs:.2f}s/epoch, "
          f"n={n}, nw={nw}, wl={wl})")


if __name__ == "__main__":
    main()
