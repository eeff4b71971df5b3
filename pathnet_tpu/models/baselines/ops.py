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
    """Batch-stats batch norm over the node axis (torch BN train mode)."""
    mu = h.mean(axis=0, keepdims=True)
    var = h.var(axis=0, keepdims=True)
    return (h - mu) * jax.lax.rsqrt(var + eps) * scale + bias


class BatchNormCtx:
    """Functional running-stats BatchNorm1d with torch semantics.

    torch ``BatchNorm1d`` normalizes with *batch* statistics in train mode
    (updating running mean/var with momentum 0.1, unbiased var) and with the
    *running* statistics in eval mode.  The zoo's forwards are pure
    functions, so the running state is threaded explicitly: the trainer
    passes the current state list, each ``__call__`` consumes one entry in
    layer order, and ``self.new`` holds the updated state to carry.

    ``states=None`` (or an entry of None) falls back to batch statistics in
    both modes — the pre-state behavior, used by golden tests and one-shot
    forwards.
    """

    def __init__(self, states, train: bool, momentum: float = 0.1):
        self.states = states
        self.train = train
        self.momentum = momentum
        self.i = 0
        self.new = []

    def __call__(self, h, scale, bias, eps: float = 1e-5):
        st = None if self.states is None else self.states[self.i]
        self.i += 1
        if st is None:
            self.new.append(None)
            return batch_norm(h, scale, bias, eps)
        # statistics and normalization in f32 even under a bf16 compute
        # dtype (bf16 variance is numerically unusable); output follows h
        h32 = h.astype(jnp.float32)
        scale32 = scale.astype(jnp.float32)
        bias32 = bias.astype(jnp.float32)
        if self.train:
            mu = h32.mean(axis=0)
            var = h32.var(axis=0)
            nrows = h.shape[0]
            unbiased = var * (nrows / max(nrows - 1, 1))
            m = self.momentum
            self.new.append({"mean": (1 - m) * st["mean"] + m * mu,
                             "var": (1 - m) * st["var"] + m * unbiased})
        else:
            self.new.append(st)
            mu, var = st["mean"], st["var"]
        out = (h32 - mu) * jax.lax.rsqrt(var + eps) * scale32 + bias32
        return out.astype(h.dtype)
