"""Golden validation of the on-device sampler against the reference C++.

The strongest available sampling-semantics check (VERDICT round-1 item 2):
compile the reference samplers from `/root/reference/preprocess/*.cpp`
UNCHANGED into a scratch dir (the shipped `gen_merw` binary hardcodes an
output dir `/data/syf/rw/` that predates the source's `./`, so the source is
the runnable oracle), run them on the checked-in cornell/cora edge inputs,
and verify against our implementation:

1. **Layout** — 1000·n·nw lines, epoch-major/node-major/walk-minor, v0 = the
   start node of its block (gen_merw.cpp:182-207).
2. **Distance semantics (exact)** — feed the *reference's* sampled walks
   through our `membership_dists` and the host BFS oracle; every one of the
   ~3.7M distance fields must equal the reference's `dis[st][v]-1` column.
3. **Transition distribution (statistical)** — per-node empirical next-hop
   frequencies of the reference walks and of our sampler must both match the
   MERW probabilities from the `.in` file within the same z-bound.
4. **Walk validity** — every consecutive pair in our walks and the
   reference's is a real edge of the input graph.

Writes `results/golden_sampler_validation.json`.

Run: python scripts/golden_vs_reference.py
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, ".")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

REF = "/root/reference/preprocess"


def stage(tmp: str) -> str:
    """Build the samplers and the ../edge_input layout they expect."""
    work = os.path.join(tmp, "work")
    edge = os.path.join(tmp, "edge_input")
    os.makedirs(work), os.makedirs(edge)
    with open("data/edge_input/cornell.in") as fin, \
         open(os.path.join(edge, "cornell.in"), "w") as fout:
        fout.write(fin.read())
    # gen.cpp reads 2-column "u v" lines (scanf %d%d, gen.cpp:86-94); feeding
    # the 3-column MERW file poisons scanf at the first float.  Stage the
    # probability-stripped version it expects.
    with open("data/edge_input/cora_nsl.in") as fin, \
         open(os.path.join(edge, "cora_nsl.in"), "w") as fout:
        fout.write(fin.readline())
        for line in fin:
            parts = line.split()
            if len(parts) >= 2:
                fout.write(f"{parts[0]} {parts[1]}\n")
    for src_name, out in (("gen_merw.cpp", "gen_merw"), ("gen.cpp", "gen")):
        subprocess.run(
            ["g++", "-O2", "-mcmodel=medium", "-o", os.path.join(work, out),
             os.path.join(REF, src_name)], check=True)
    return work


def empirical_tv(nodes: np.ndarray, P_rows, deg, nbrs, max_z=6.0):
    """Max per-node z-score of empirical next-hop counts vs expected.

    nodes: [L, wl] walk records.  For each node u with enough visits,
    compares the count of each neighbor slot against Binomial(n_u, p) via a
    z-statistic; returns (max_z, worst_row_tv, visits_checked).
    """
    L, wl = nodes.shape
    frm = nodes[:, :-1].ravel()
    to = nodes[:, 1:].ravel()
    n = len(deg)
    worst_z, worst_tv, checked = 0.0, 0.0, 0
    order = np.argsort(frm, kind="stable")
    frm_s, to_s = frm[order], to[order]
    starts = np.searchsorted(frm_s, np.arange(n + 1))
    for u in range(n):
        lo, hi = starts[u], starts[u + 1]
        n_u = hi - lo
        if n_u < 50:
            continue
        nb, p = nbrs[u], P_rows[u]
        obs = to_s[lo:hi]
        # duplicate neighbor records share a target id: merge by id, then
        # normalize — reference edge files carry duplicated records (cornell
        # row sums are exactly 2.0) and both samplers draw proportionally
        uniq, inv = np.unique(nb, return_inverse=True)
        cm = np.zeros(len(uniq))
        pm = np.zeros(len(uniq))
        np.add.at(pm, inv, p)
        pm = pm / max(pm.sum(), 1e-300)
        for j, v in enumerate(uniq):
            cm[j] = np.count_nonzero(obs == v)
        sd = np.sqrt(np.maximum(n_u * pm * (1 - pm), 1e-9))
        z = np.abs(cm - n_u * pm) / sd
        worst_z = max(worst_z, float(z.max()))
        worst_tv = max(worst_tv, float(0.5 * np.abs(cm / n_u - pm).sum()))
        checked += 1
    return worst_z, worst_tv, checked


def simulate_cpp_alias(nbrs: list, probs: list) -> list:
    """Exact replica of the reference AliasTable::init (gen_merw.cpp:23-79):
    FIFO small/large queues, dynamically appended slots, the |res-1|<eps
    double-slot special case, and leftovers saturated at split=1.  Returns
    the per-node induced next-hop distribution dict {target: prob}.

    The reference's edge files carry every record twice (cornell.in row
    sums are exactly 2.0), and Vose on mass-2 input is NOT proportional —
    this simulation is the ground truth for what the shipped binary
    actually samples.
    """
    from collections import deque

    eps = 1e-8
    dists = []
    for a, p in zip(nbrs, probs):
        n = len(a)
        q = [float(x) * n for x in p]
        A, B, S = [], [], []
        qA, qB = deque(), deque()
        for i in range(n):
            (qA if q[i] > 1.0 else qB).append((int(a[i]), q[i]))
        while qA and qB:
            idA, probA = qA.popleft()
            idB, probB = qB.popleft()
            A.append(idA), B.append(idB), S.append(probB)
            res = probA - (1.0 - probB)
            if abs(res - 1.0) < eps:
                A.append(idA), B.append(idA), S.append(res)
                continue
            (qA if res > 1.0 else qB).append((idA, res))
        for dq in (qA, qB):
            while dq:
                idX, _ = dq.popleft()
                A.append(idX), B.append(idX), S.append(1.0)
        m = max(len(A), 1)
        d: dict = {}
        for idA, idB, s in zip(A, B, S):
            d[idB] = d.get(idB, 0.0) + s / m          # p <= S picks B
            d[idA] = d.get(idA, 0.0) + (1.0 - s) / m  # p > S picks A
        dists.append(d)
    return dists


def empirical_vs_dists(nodes: np.ndarray, dists: list, n: int):
    """Max z of empirical next-hop counts vs arbitrary per-node dists."""
    frm = nodes[:, :-1].ravel()
    to = nodes[:, 1:].ravel()
    order = np.argsort(frm, kind="stable")
    frm_s, to_s = frm[order], to[order]
    starts = np.searchsorted(frm_s, np.arange(n + 1))
    worst_z = worst_tv = 0.0
    for u in range(n):
        lo, hi = starts[u], starts[u + 1]
        n_u = hi - lo
        if n_u < 50 or not dists[u]:
            continue
        obs = to_s[lo:hi]
        keys = np.asarray(sorted(dists[u]))
        pm = np.asarray([dists[u][k] for k in keys])
        cm = np.asarray([(obs == k).sum() for k in keys], float)
        sd = np.sqrt(np.maximum(n_u * pm * (1 - pm), 1e-9))
        worst_z = max(worst_z, float((np.abs(cm - n_u * pm) / sd).max()))
        worst_tv = max(worst_tv, float(0.5 * np.abs(cm / n_u - pm).sum()
                                       + 0.5 * abs(1.0 - pm.sum())))
    return worst_z, worst_tv


def check_walk_edges(nodes: np.ndarray, g) -> bool:
    ecode = np.unique(g.src.astype(np.int64) * g.n + g.dst)
    pcode = np.unique(nodes[:, :-1].astype(np.int64) * g.n + nodes[:, 1:])
    return bool(np.isin(pcode, ecode).all())


def validate_merw(work: str, report: dict, nw=5, wl=4) -> None:
    from pathnet_tpu.data import Graph
    from pathnet_tpu.data.formats import parse_path_file
    from pathnet_tpu.sample.distance import (bfs_distance_table_host,
                                             membership_dists)
    from pathnet_tpu.sample.walk import PathSampler
    import jax
    import jax.numpy as jnp

    t0 = time.time()
    subprocess.run(["./gen_merw", "cornell", str(nw), str(wl)], cwd=work,
                   check=True, capture_output=True)
    gen_s = time.time() - t0
    g = Graph.from_edge_input("data/edge_input/cornell.in", name="cornell")
    nodes, dists = parse_path_file(
        os.path.join(work, f"cornell_{nw}_{wl}_merw.txt"), wl)
    n = g.n
    epochs = len(nodes) // (n * nw)

    r = {"lines": int(len(nodes)), "epochs": epochs, "gen_seconds": gen_s}
    r["layout_ok"] = bool(
        len(nodes) == 1000 * n * nw
        and (nodes[:, 0].reshape(epochs, n, nw)
             == np.arange(n)[None, :, None]).all())

    # exact distance semantics: reference walks -> our distance kernels.
    # The [n, n] BFS-table lookup below covers ALL fields (vectorized); the
    # membership kernel (the production fast path) is additionally checked
    # on the first 50 epochs — the N2 compare is O(walks * D^2) and the
    # verification host has 2 CPUs.
    E_CHK = min(50, epochs)
    walks_sub = jnp.asarray(nodes.reshape(epochs, n, nw, wl)[:E_CHK]
                            .transpose(1, 0, 2, 3).reshape(n, E_CHK * nw, wl))
    dref_sub = (dists.reshape(epochs, n, nw, wl)[:E_CHK]
                .transpose(1, 0, 2, 3).reshape(n, E_CHK * nw, wl))
    ps = PathSampler.build(g, nw, wl, kind="merw",
                           distance_backend="membership")
    starts = jnp.arange(n, dtype=jnp.int32)
    ours = np.asarray(membership_dists(ps.nbr, ps.deg, starts, walks_sub,
                                       chunk=16))
    r["membership_dist_mismatches"] = int((ours != dref_sub).sum())
    r["membership_epochs_checked"] = E_CHK
    dref = dists.reshape(epochs, n, nw, wl)

    host_table = bfs_distance_table_host(g, wl)
    lookup = host_table[np.repeat(np.arange(n), nw)[None, :].repeat(epochs, 0)
                        .reshape(epochs, n, nw)[..., None],
                        nodes.reshape(epochs, n, nw, wl)]
    r["bfs_table_mismatches"] = int((lookup != dref).sum())

    # transition statistics: reference walks vs P, ours vs P
    P_rows, nbrs = [], []
    for u in range(n):
        sel = g.src == u
        nbrs.append(g.dst[sel])
        P_rows.append(g.prob[sel])
    z_ref, tv_ref, rows = empirical_tv(nodes, P_rows, g.degrees(), nbrs)
    r["ref_freq_max_z"] = z_ref
    r["ref_freq_worst_tv"] = tv_ref
    r["rows_checked"] = rows
    # The reference binary is NOT proportional on these files: every record
    # is duplicated (row sums exactly 2.0) and Vose on mass-2 input skews.
    # Validate the reference against an exact simulation of its own alias
    # construction instead — this is the true behavioral characterization.
    sim = simulate_cpp_alias(nbrs, P_rows)
    z_sim, tv_sim = empirical_vs_dists(nodes, sim, n)
    r["ref_vs_simulated_alias_max_z"] = z_sim
    r["ref_vs_simulated_alias_worst_tv"] = tv_sim

    key = jax.random.PRNGKey(0)
    ours_all = []
    for e in range(300):    # ~4.5k transitions/node — ample statistics
        p, _ = ps.sample(jax.random.fold_in(key, e))
        ours_all.append(np.asarray(p).reshape(-1, wl))
    ours_nodes = np.concatenate(ours_all, axis=0)
    z_our, tv_our, _ = empirical_tv(ours_nodes, P_rows, g.degrees(), nbrs)
    r["our_freq_max_z"] = z_our
    r["our_freq_worst_tv"] = tv_our

    r["ref_walks_on_edges"] = check_walk_edges(nodes, g)
    r["our_walks_on_edges"] = check_walk_edges(ours_nodes, g)
    report["gen_merw_cornell"] = r


def validate_uniform(work: str, report: dict, nw=5, wl=4) -> None:
    """gen.cpp oracle: uniform walks on symmetrized + self-looped cora."""
    from pathnet_tpu.data import Graph
    from pathnet_tpu.data.formats import parse_path_file
    from pathnet_tpu.sample.distance import bfs_distance_table_host
    import jax
    from pathnet_tpu.sample.walk import PathSampler

    t0 = time.time()
    subprocess.run(["./gen", "cora", str(nw), str(wl)], cwd=work,
                   check=True, capture_output=True)
    gen_s = time.time() - t0
    out = os.path.join(work, f"cora_{nw}_{wl}_nsl.txt")
    g0 = Graph.from_edge_input("data/edge_input/cora_nsl.in", name="cora")
    g = g0.symmetrized(add_self_loops=True)   # gen.cpp:83-94 semantics
    nodes, dists = parse_path_file(out, wl)
    n = g.n
    epochs = len(nodes) // (n * nw)
    r = {"lines": int(len(nodes)), "epochs": epochs, "gen_seconds": gen_s}
    r["layout_ok"] = bool(
        len(nodes) == 1000 * n * nw
        and (nodes[:, 0].reshape(epochs, n, nw)
             == np.arange(n)[None, :, None]).all())

    host_table = bfs_distance_table_host(g, wl)
    dref = dists.reshape(epochs, n, nw, wl)
    lookup = host_table[np.repeat(np.arange(n), nw)[None, :].repeat(epochs, 0)
                        .reshape(epochs, n, nw)[..., None],
                        nodes.reshape(epochs, n, nw, wl)]
    r["bfs_table_mismatches"] = int((lookup != dref).sum())

    deg = g.degrees()
    P_rows, nbrs = [], []
    for u in range(n):
        sel = g.src == u
        nbrs.append(g.dst[sel])
        P_rows.append(np.full(int(sel.sum()), 1.0 / max(int(sel.sum()), 1)))
    sub = nodes[: 200 * n * nw]  # statistics from 200 epochs is plenty
    z_ref, tv_ref, rows = empirical_tv(sub, P_rows, deg, nbrs)
    r["ref_freq_max_z"] = z_ref
    r["ref_freq_worst_tv"] = tv_ref
    r["rows_checked"] = rows

    ps = PathSampler.build(g0, nw, wl, kind="uniform",
                           distance_backend="none")
    key = jax.random.PRNGKey(0)
    ours_all = []
    for e in range(200):
        p, _ = ps.sample(jax.random.fold_in(key, e))
        ours_all.append(np.asarray(p).reshape(-1, wl))
    ours_nodes = np.concatenate(ours_all, axis=0)
    z_our, tv_our, _ = empirical_tv(ours_nodes, P_rows, deg, nbrs)
    r["our_freq_max_z"] = z_our
    r["our_freq_worst_tv"] = tv_our
    r["ref_walks_on_edges"] = check_walk_edges(nodes, g)
    r["our_walks_on_edges"] = check_walk_edges(ours_nodes, g)
    report["gen_uniform_cora"] = r


def main():
    report = {}
    with tempfile.TemporaryDirectory() as tmp:
        work = stage(tmp)
        validate_merw(work, report)
        validate_uniform(work, report)
    # Pass criteria: structure/layout/distances exact everywhere; OUR
    # samplers statistically match the (normalized) target distribution;
    # the REFERENCE binary matches either the target or the exact
    # simulation of its own alias construction (it is knowably skewed on
    # duplicated-record inputs — see validate_merw).
    ok = all(
        r["layout_ok"] and r.get("membership_dist_mismatches", 0) == 0
        and r["bfs_table_mismatches"] == 0
        and r["our_freq_max_z"] < 6.0
        and min(r["ref_freq_max_z"],
                r.get("ref_vs_simulated_alias_max_z", np.inf)) < 6.0
        and r["ref_walks_on_edges"] and r["our_walks_on_edges"]
        for r in report.values())
    report["ok"] = ok
    os.makedirs("results", exist_ok=True)
    with open("results/golden_sampler_validation.json", "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
