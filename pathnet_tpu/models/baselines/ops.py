"""Shared sparse graph ops for the baseline zoo.

TPU-native message passing: edge-list gathers + ``segment_sum`` scatters
(static shapes, XLA-fusable) instead of PyG's MessagePassing machinery.  The
edge list is canonicalized host-side once per graph.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from ...data.graph import Graph


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class EdgeGraph:
    """Device-side symmetric edge list with optional normalization weights."""

    n: int
    src: jnp.ndarray      # int32 [E]
    dst: jnp.ndarray      # int32 [E]
    w: jnp.ndarray        # float32 [E]

    @staticmethod
    def from_graph(g: Graph, norm: str = "sym", add_self_loops: bool = True
                   ) -> "EdgeGraph":
        """Build Â from a host Graph.

        norm: "sym" = D^-1/2 (A [+I]) D^-1/2 (GCN), "rw" = D^-1 (A [+I]),
        "none" = raw binary.
        """
        a = g.to_adjacency(binary=True)
        a = a.maximum(a.T)
        if add_self_loops:
            a = a + sp.eye(g.n, format="csr")
            a.data = np.minimum(a.data, 1.0)
        coo = a.tocoo()
        src = coo.row.astype(np.int32)
        dst = coo.col.astype(np.int32)
        deg = np.asarray(a.sum(axis=1)).ravel()
        if norm == "sym":
            dinv = 1.0 / np.sqrt(np.maximum(deg, 1.0))
            w = dinv[src] * dinv[dst]
        elif norm == "rw":
            w = 1.0 / np.maximum(deg[src], 1.0)
        else:
            w = np.ones(len(src))
        return EdgeGraph(n=g.n, src=jnp.asarray(src), dst=jnp.asarray(dst),
                         w=jnp.asarray(w, jnp.float32))

    def tree_flatten(self):
        return (self.src, self.dst, self.w), (self.n,)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        (n,) = aux
        src, dst, w = leaves
        return cls(n=n, src=src, dst=dst, w=w)


def spmm(eg: EdgeGraph, h: jnp.ndarray, w: Optional[jnp.ndarray] = None
         ) -> jnp.ndarray:
    """Â @ h as gather + segment_sum over edges (h: [n, F])."""
    weights = eg.w if w is None else w
    msgs = h[eg.src] * weights[:, None]
    return jax.ops.segment_sum(msgs, eg.dst, num_segments=eg.n)


def segment_softmax(scores: jnp.ndarray, seg: jnp.ndarray, n: int
                    ) -> jnp.ndarray:
    """Softmax of edge scores grouped by destination segment (GAT-style)."""
    smax = jax.ops.segment_max(scores, seg, num_segments=n)
    ex = jnp.exp(scores - smax[seg])
    denom = jax.ops.segment_sum(ex, seg, num_segments=n)
    return ex / jnp.maximum(denom[seg], 1e-16)


def batch_norm(h: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
               eps: float = 1e-5) -> jnp.ndarray:
    """Full-batch batch norm over the node axis.

    Transductive training is full-batch, so batch statistics are
    deterministic per step; we use them in both train and eval (deviation
    from torch BN running stats, documented — affects baselines only).
    """
    mu = h.mean(axis=0, keepdims=True)
    var = h.var(axis=0, keepdims=True)
    return (h - mu) * jax.lax.rsqrt(var + eps) * scale + bias
