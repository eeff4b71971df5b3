"""Truncated-BFS hop distances.

The reference runs one O(n + m) BFS per node into a static ``char
dis[N][N]`` (~10 GB, gen_merw.cpp:10,101-123, hence ``-mcmodel=medium``) and
stops expanding past ``seq_len`` hops (:110-111).  Path records carry
``d_i = dis[start][v_i] - 1 ∈ [0, seq_len-1]`` — every walk-visited node is
within ``seq_len-1`` hops of its start, so truncation never loses a needed
value.

TPU-native replacement: frontier-wave BFS for a *chunk* of start nodes at a
time.  One wave = "reached |= frontier reaches neighbor" computed as a
segment-sum over the edge list — O(E * chunk) VPU work, no [n, n]
materialization during propagation.  The result is an ``[n, n]`` int8 table
(distance 0..max_hops, -1 beyond truncation) built once per graph and
reused for every epoch and round; memory O(n^2) bytes, so pubmed-scale
(19.7k → 389 MB) fits in HBM and larger graphs use the host-table or
chunked modes (see PathSampler).
"""
from __future__ import annotations

import functools
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..data.graph import Graph, DeviceGraph


@functools.partial(jax.jit, static_argnames=("n", "max_hops"))
def _bfs_chunk(src: jnp.ndarray, dst: jnp.ndarray, starts: jnp.ndarray,
               n: int, max_hops: int) -> jnp.ndarray:
    """Distances [chunk, n] int8 from each start, truncated at max_hops."""
    C = starts.shape[0]
    dist = jnp.full((C, n), -1, jnp.int8)
    dist = dist.at[jnp.arange(C), starts].set(0)
    frontier = jnp.zeros((C, n), jnp.float32).at[jnp.arange(C), starts].set(1.0)

    def wave(k, state):
        dist, frontier = state
        # edge push: reached[c, v] = any_{(u,v) in E} frontier[c, u]
        vals = frontier[:, src]                      # [C, E]
        reached = jax.ops.segment_sum(vals.T, dst, num_segments=n)  # [n, C]
        new = (reached.T > 0) & (dist < 0)
        dist = jnp.where(new, jnp.int8(k), dist)
        return dist, new.astype(jnp.float32)

    dist, _ = jax.lax.fori_loop(1, max_hops + 1, wave, (dist, frontier))
    return dist


def bfs_distance_table(g: Graph, max_hops: int, chunk: int = 1024,
                       symmetric_hint: bool = True) -> jnp.ndarray:
    """Full [n, n] int8 truncated-distance table, built chunk-by-chunk on device.

    Uses the directed edge records as-is (reference inputs contain both
    directions, so BFS is effectively over the undirected graph —
    init_rw.py:81-86 writes u→v and v→u).
    """
    src = jnp.asarray(g.src, jnp.int32)
    dst = jnp.asarray(g.dst, jnp.int32)
    n = g.n
    rows = []
    for lo in range(0, n, chunk):
        hi = min(lo + chunk, n)
        starts = jnp.arange(lo, hi, dtype=jnp.int32)
        if hi - lo < chunk:  # pad to static shape, drop later
            starts = jnp.concatenate(
                [starts, jnp.zeros(chunk - (hi - lo), jnp.int32)])
        block = _bfs_chunk(src, dst, starts, n, max_hops)
        rows.append(block[: hi - lo])
    return jnp.concatenate(rows, axis=0)


def membership_dists(nbr: jnp.ndarray, deg: jnp.ndarray, starts: jnp.ndarray,
                     paths: jnp.ndarray, chunk: int = 8192) -> jnp.ndarray:
    """Exact truncated-BFS distances of walk nodes WITHOUT the [n, n] table.

    Valid for ``walk_len <= 4``.  Key facts: a node at walk position ``i``
    satisfies ``d(start, v_i) = min(i, first BFS level containing v_i)``, so
    - position 0: d = 0;
    - position 1: d = 0 iff v == start else 1 (walks follow edges);
    - position 2: needs only an N1(start) membership test;
    - position 3: needs N1 and N2 tests, where ``v ∈ N2(s)`` iff
      ``N(v) ∩ N(s) ≠ ∅`` (symmetric graph).

    N1 tests are padded-row compares against ``nbr[s]`` — zero gathers when
    starts are all nodes in order; the N2 test is one row gather
    (``nbr[v3]``) plus a chunked [C, nw, D, D] compare.  Everything is
    vector (VPU) work — no scalar gathers, unlike the [n, n] table lookup,
    which is latency-bound on TPU.

    Shapes: nbr [n, D], deg [n], starts [S], paths [S, nw, wl<=4];
    returns int32 [S, nw, wl].
    """
    S, nw, wl = paths.shape
    assert wl <= 4, "membership distance mode supports walk_len <= 4"
    D = nbr.shape[1]
    nbr_s = nbr[starts]                               # [S, D]
    mask_s = jnp.arange(D)[None, :] < deg[starts][:, None]   # [S, D]
    sv = starts[:, None]                              # [S, 1]

    def n1_test(v):   # v: [S, nw] -> bool [S, nw]
        hit = (nbr_s[:, None, :] == v[:, :, None]) & mask_s[:, None, :]
        return jnp.any(hit, axis=-1)

    cols = [jnp.zeros((S, nw), jnp.int32)]
    if wl > 1:
        v1 = paths[:, :, 1]
        cols.append(jnp.where(v1 == sv, 0, 1).astype(jnp.int32))
    if wl > 2:
        v2 = paths[:, :, 2]
        d2 = jnp.where(v2 == sv, 0, jnp.where(n1_test(v2), 1, 2))
        cols.append(d2.astype(jnp.int32))
    if wl > 3:
        v3 = paths[:, :, 3]
        in1 = n1_test(v3)

        def n2_chunk(args):
            nbr_v, mv, ns, ms = args
            # common neighbor: any j,k with nbr_v[.., j] == nbr_s[.., k]
            hit = (nbr_v[:, :, :, None] == ns[:, None, None, :])
            hit = hit & mv[:, :, :, None] & ms[:, None, None, :]
            return jnp.any(hit, axis=(-1, -2))

        nbr_v3 = nbr[v3]                              # [S, nw, D] row gather
        mask_v3 = jnp.arange(D)[None, None, :] < deg[v3][:, :, None]
        outs = []
        for lo in range(0, S, chunk):
            hi = min(lo + chunk, S)
            outs.append(n2_chunk((nbr_v3[lo:hi], mask_v3[lo:hi],
                                  nbr_s[lo:hi], mask_s[lo:hi])))
        in2 = jnp.concatenate(outs, axis=0)
        d3 = jnp.where(v3 == sv, 0,
                       jnp.where(in1, 1, jnp.where(in2, 2, 3)))
        cols.append(d3.astype(jnp.int32))
    return jnp.stack(cols, axis=-1)


def build_khop_tables(g: Graph, max_level: int,
                      max_width: Optional[int] = None):
    """Padded sorted exact-k-hop neighbor tables for levels 1..max_level.

    ``tables[k-1]`` is ``int32 [n, Dk]`` holding the sorted node ids at BFS
    distance exactly ``k`` from each row's node, padded with the sentinel
    ``n`` (greater than any id, so a searchsorted probe never matches it).
    Built host-side once per graph with sparse boolean matrix powers —
    O(n·Dk) memory instead of the O(n²) dense table, which is what makes
    walk_len=5 distances feasible at gen_epoch scale (the reference ablates
    to 5, draw_figs/length.py:53; VERDICT r2 item 5).

    ``max_width`` guards pathological densification: if any level's widest
    row exceeds it, a ValueError reports the level so the caller can fall
    back to the dense/chunked backend.
    """
    import scipy.sparse as sp

    def binarize(m):
        m = m.tocsr()
        m.eliminate_zeros()
        m.data = np.ones_like(m.data)
        return m

    a = binarize(sp.csr_matrix(
        (np.ones(len(g.src), np.int8), (g.src, g.dst)), shape=(g.n, g.n))
        + sp.csr_matrix(
        (np.ones(len(g.src), np.int8), (g.dst, g.src)), shape=(g.n, g.n)))
    reach = sp.identity(g.n, dtype=np.int8, format="csr")   # dist <= level-1
    frontier = a.copy()
    tables = []
    for level in range(1, max_level + 1):
        exact = binarize(frontier - frontier.multiply(reach))  # dist == level
        exact.sort_indices()
        widths = np.diff(exact.indptr)
        Dk = max(int(widths.max()) if len(widths) else 0, 1)
        if max_width is not None and Dk > max_width:
            raise ValueError(
                f"k-hop level {level} widest row is {Dk} > {max_width}; "
                "use distance_backend='dense' or 'host'")
        tab = np.full((g.n, Dk), g.n, np.int32)
        rows = np.repeat(np.arange(g.n), widths)
        pos = np.arange(len(exact.indices)) - np.repeat(exact.indptr[:-1],
                                                        widths)
        tab[rows, pos] = exact.indices                # CSR rows are sorted
        tables.append(tab)
        if level < max_level:
            reach = binarize(reach + exact)
            frontier = binarize(a @ reach)
    return tables


def _row_membership(tables_rows, v):
    """v [S, nw] against per-start sorted rows [S, Dk] → bool [S, nw]."""
    def one(row, vals):
        j = jnp.searchsorted(row, vals)
        j = jnp.minimum(j, row.shape[0] - 1)
        return row[j] == vals
    return jax.vmap(one)(tables_rows, v)


def khop_dists(tables, starts: jnp.ndarray, paths: jnp.ndarray
               ) -> jnp.ndarray:
    """Truncated-BFS distances of walk nodes from sorted k-hop tables.

    Exact for any walk_len <= len(tables)+1: a node at walk position ``i``
    has ``d = min(i, BFS level)``, and its level is found by sorted-row
    membership probes (searchsorted — O(log Dk) per test, no O(D²) compare
    blowup and no O(n²) table).  Position 0 is 0; position 1 is 0 iff
    v == start else 1 (walks follow edges).
    """
    S, nw, wl = paths.shape
    assert wl <= len(tables) + 1, "need tables for levels 1..walk_len-1"
    sv = starts[:, None]
    cols = [jnp.zeros((S, nw), jnp.int32)]
    if wl > 1:
        v1 = paths[:, :, 1]
        cols.append(jnp.where(v1 == sv, 0, 1).astype(jnp.int32))
    table_rows = [t[starts] for t in tables[:wl - 1]]   # [S, Dk] gathers
    for i in range(2, wl):
        v = paths[:, :, i]
        d = jnp.full((S, nw), i, jnp.int32)
        for level in range(i - 1, 0, -1):
            hit = _row_membership(table_rows[level - 1], v)
            d = jnp.where(hit, level, d)
        d = jnp.where(v == sv, 0, d)
        cols.append(d)
    return jnp.stack(cols, axis=-1)


def bfs_distance_table_host(g: Graph, max_hops: int, chunk: int = 2048
                            ) -> np.ndarray:
    """Host-side oracle via scipy BFS (validation + host-table mode).

    Chunked over sources so the float64 dijkstra intermediate stays
    O(chunk * n); the int8 result is O(n^2) host RAM.
    """
    import scipy.sparse as sp
    import scipy.sparse.csgraph as csgraph

    adj = sp.csr_matrix((np.ones(len(g.src), np.float32), (g.src, g.dst)),
                        shape=(g.n, g.n))
    out = np.empty((g.n, g.n), np.int8)
    for lo in range(0, g.n, chunk):
        hi = min(lo + chunk, g.n)
        d = csgraph.dijkstra(adj, unweighted=True, limit=max_hops,
                             directed=True, indices=np.arange(lo, hi))
        out[lo:hi] = np.where(np.isfinite(d), d, -1).astype(np.int8)
    return out
