"""CLI: compute MERW transition probabilities and write ``<name>_nsl.in``.

The TPU-native equivalent of the reference's ``preprocess/init_rw.py``
(init_rw.py:48-89): load a dataset's edge structure, run the principal-
eigenpair power iteration on device, and write the weighted edge-input file
in the reference layout (header ``n m`` then ``u v P[u,v]`` per directed
record, both directions — init_rw.py:81-86) so the reference C++ samplers
can consume our probabilities and vice versa.

    python -m pathnet_tpu.init_rw -data cornell [-data cora ...] \
        [--data-root data] [--out data/edge_input]

Unlike the reference (O(n²) dense loop over a scipy lil matrix, multi-hour
for pubmed — compute_merw.py:115-120), the probability assembly here is
sparse end-to-end.
"""
from __future__ import annotations

import argparse
import os
import time


def main(argv=None):
    p = argparse.ArgumentParser(description="MERW edge-input writer")
    p.add_argument("-data", "--data_name", action="append", required=True)
    p.add_argument("--data-root", type=str, default="data")
    p.add_argument("--out", type=str, default=None,
                   help="output dir (default <data-root>/edge_input)")
    p.add_argument("--platform", type=str, default=None)
    args = p.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    from .data.formats import write_edge_input
    from .data.registry import load_structure
    from .merw import merw_graph
    from .utils import enable_compilation_cache

    enable_compilation_cache()
    out_dir = args.out or os.path.join(args.data_root, "edge_input")
    os.makedirs(out_dir, exist_ok=True)
    import numpy as np

    for name in args.data_name:
        t0 = time.time()
        g = load_structure(name, args.data_root)
        # MERW from the adjacency structure (record multiplicity = weight),
        # matching init_rw.py:75 — any probability column on the input is
        # ignored, not propagated
        gm = merw_graph(g, weights=np.ones(len(g.src)))
        path = os.path.join(out_dir, f"{name}_nsl.in")
        write_edge_input(path, gm.n, gm.src, gm.dst, gm.prob)
        print(f"{name}: n={gm.n} m={len(gm.src)} -> {path} "
              f"({time.time() - t0:.1f}s)")


if __name__ == "__main__":
    main()
