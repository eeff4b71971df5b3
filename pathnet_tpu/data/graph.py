"""Graph containers: host-side edge records and device-side padded CSR.

The reference keeps the graph as C++ ``vector<int> E[N]`` adjacency plus a
parallel probability array (gen_merw.cpp:14-15).  The TPU-native layout is a
*padded* CSR: dense ``[n, max_deg]`` neighbor/probability arrays with a
degree vector, so every sampling/BFS kernel is a static-shape gather — no
data-dependent shapes under jit.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class Graph:
    """Host-side graph: directed edge records in file order + payloads.

    Duplicate edge records are preserved (the reference's sampler treats each
    record as a separate alias-table entry, so duplicates add probability
    mass — gen_merw.cpp:166-176).
    """

    n: int
    src: np.ndarray        # int32 [m]
    dst: np.ndarray        # int32 [m]
    prob: np.ndarray       # float64 [m] — per-record transition probability
    features: Optional[np.ndarray] = None   # float32 [n, f]
    labels: Optional[np.ndarray] = None     # int64 [n], -1 = unlabeled
    name: str = ""

    # -- constructors -------------------------------------------------------

    @staticmethod
    def from_edge_input(path: str, name: str = "") -> "Graph":
        from .formats import read_edge_input
        n, src, dst, prob = read_edge_input(path)
        return Graph(n=n, src=src, dst=dst, prob=prob, name=name or path)

    @staticmethod
    def from_edge_index(n: int, edge_index: np.ndarray, name: str = "") -> "Graph":
        """From a [2, m] COO edge index (npy-triple datasets)."""
        src = edge_index[0].astype(np.int32)
        dst = edge_index[1].astype(np.int32)
        return Graph(n=n, src=src, dst=dst, prob=np.ones(len(src)), name=name)

    @staticmethod
    def from_scipy(adj: sp.spmatrix, name: str = "") -> "Graph":
        coo = adj.tocoo()
        return Graph(n=adj.shape[0], src=coo.row.astype(np.int32),
                     dst=coo.col.astype(np.int32),
                     prob=coo.data.astype(np.float64), name=name)

    # -- transforms ---------------------------------------------------------

    def to_adjacency(self, binary: bool = True) -> sp.csr_matrix:
        """Collapse records to a CSR adjacency (duplicates summed or binarized)."""
        a = sp.csr_matrix((self.prob, (self.src, self.dst)), shape=(self.n, self.n))
        if binary:
            a.data = np.ones_like(a.data)
        return a

    def symmetrized(self, add_self_loops: bool = False) -> "Graph":
        """Undirected structural copy (uniform-walk prep, gen.cpp:83-94).

        The uniform sampler symmetrizes every record and injects one
        self-loop per node; probabilities are discarded (walks are uniform
        over the multiset of incident records).
        """
        src = np.concatenate([self.src, self.dst])
        dst = np.concatenate([self.dst, self.src])
        if add_self_loops:
            loops = np.arange(self.n, dtype=np.int32)
            src = np.concatenate([src, loops])
            dst = np.concatenate([dst, loops])
        return Graph(n=self.n, src=src.astype(np.int32), dst=dst.astype(np.int32),
                     prob=np.ones(len(src)), features=self.features,
                     labels=self.labels, name=self.name)

    # -- padded CSR ---------------------------------------------------------

    def degrees(self) -> np.ndarray:
        return np.bincount(self.src, minlength=self.n).astype(np.int32)

    def padded_csr(self, pad_to: Optional[int] = None
                   ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Return ``(nbr [n, D], prob [n, D], deg [n])`` padded arrays.

        Records keep file order within a row.  Padding slots point at the row
        node itself with probability 0 so out-of-range gathers stay in
        bounds.  Rows are renormalized to sum to 1 (isolated nodes become
        pure self-loops, matching the reference's behavior of never escaping
        an isolated node).
        """
        deg = self.degrees()
        D = int(pad_to if pad_to is not None else max(1, deg.max(initial=1)))
        order = np.argsort(self.src, kind="stable")
        s, d, p = self.src[order], self.dst[order], self.prob[order]
        offsets = np.zeros(self.n + 1, np.int64)
        np.cumsum(deg, out=offsets[1:])
        nbr = np.tile(np.arange(self.n, dtype=np.int32)[:, None], (1, D))
        prob = np.zeros((self.n, D), np.float32)
        slot = np.arange(len(s)) - offsets[s]          # position within row
        nbr[s, slot] = d
        prob[s, slot] = p.astype(np.float32)
        rowsum = prob.sum(axis=1, keepdims=True)
        safe = np.where(rowsum > 0, rowsum, 1.0)
        prob = prob / safe
        prob[deg == 0, 0] = 1.0                        # isolated: self-loop
        return nbr, prob, deg


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class DeviceGraph:
    """Device-resident padded-CSR graph (leaves are jnp arrays)."""

    n: int                 # static
    max_deg: int           # static
    nbr: jnp.ndarray       # int32 [n, D]
    prob: jnp.ndarray      # float32 [n, D] row-normalized
    deg: jnp.ndarray       # int32 [n]

    @staticmethod
    def from_graph(g: Graph, pad_to: Optional[int] = None) -> "DeviceGraph":
        nbr, prob, deg = g.padded_csr(pad_to)
        return DeviceGraph(n=g.n, max_deg=nbr.shape[1],
                           nbr=jnp.asarray(nbr), prob=jnp.asarray(prob),
                           deg=jnp.asarray(deg))

    def tree_flatten(self):
        return (self.nbr, self.prob, self.deg), (self.n, self.max_deg)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        n, max_deg = aux
        nbr, prob, deg = leaves
        return cls(n=n, max_deg=max_deg, nbr=nbr, prob=prob, deg=deg)
