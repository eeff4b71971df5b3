"""Alias-method (Vose) sampling tables as dense device arrays.

The reference builds one C++ alias table per node (gen_merw.cpp:17-93) and
rolls with ``rand()`` (:81-91).  TPU-native layout: three ``[n, max_deg]``
arrays — ``lo``/``hi`` neighbor ids and the ``split`` probability — so one
walk step for W walkers is four flat gathers + a select, all O(1) per draw
and fully vectorized.  Construction is host-side (one-time, O(E) total; a
C++ fast path lives in csrc/fastgraph.cpp for large graphs).
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..data.graph import DeviceGraph


def build_alias_tables(nbr: np.ndarray, prob: np.ndarray, deg: np.ndarray
                       ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vose construction per row.

    ``prob`` rows must sum to 1 over the first ``deg[u]`` slots.  Returns
    ``(lo, hi, split)``: drawing slot ``j ~ U[0, deg[u])`` and coin
    ``u2 ~ U[0,1)`` yields neighbor ``lo[u, j]`` if ``u2 < split[u, j]``
    else ``hi[u, j]`` — exactly the reference's ``p > S[x] ? A[x] : B[x]``
    with A=hi, B=lo (gen_merw.cpp:88-90).
    """
    try:
        from ..csrc import fastgraph
        if fastgraph.available():
            return fastgraph.build_alias_tables(nbr, prob, deg)
    except ImportError:
        pass
    return _build_alias_tables_np(nbr, prob, deg)


def _build_alias_tables_np(nbr: np.ndarray, prob: np.ndarray, deg: np.ndarray
                           ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    n, D = prob.shape
    lo = nbr.copy()
    hi = nbr.copy()
    split = np.ones((n, D), np.float32)
    for u in range(n):
        k = int(deg[u])
        if k <= 1:
            continue
        q = prob[u, :k].astype(np.float64) * k
        alias = np.arange(k)
        small = [i for i in range(k) if q[i] < 1.0]
        large = [i for i in range(k) if q[i] >= 1.0]
        while small and large:
            s = small.pop()
            l = large.pop()
            alias[s] = l
            q[l] = (q[l] + q[s]) - 1.0
            if q[l] < 1.0:
                small.append(l)
            else:
                large.append(l)
        for i in small + large:
            q[i] = 1.0
        split[u, :k] = np.minimum(q, 1.0).astype(np.float32)
        lo[u, :k] = nbr[u, :k]
        hi[u, :k] = nbr[u, alias]
    return lo, hi, split


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class AliasSampler:
    """Device-resident alias tables for one graph."""

    n: int
    max_deg: int
    lo: jnp.ndarray      # int32 [n, D]
    hi: jnp.ndarray      # int32 [n, D]
    split: jnp.ndarray   # float32 [n, D]
    deg: jnp.ndarray     # int32 [n]

    @staticmethod
    def from_device_graph(dg: DeviceGraph) -> "AliasSampler":
        lo, hi, split = build_alias_tables(np.asarray(dg.nbr), np.asarray(dg.prob),
                                           np.asarray(dg.deg))
        return AliasSampler(n=dg.n, max_deg=dg.max_deg, lo=jnp.asarray(lo),
                            hi=jnp.asarray(hi), split=jnp.asarray(split),
                            deg=jnp.asarray(dg.deg))

    def step(self, cur: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
        """One walk step for a batch of walkers: cur [W] -> next [W]."""
        k1, k2 = jax.random.split(key)
        deg = jnp.maximum(self.deg[cur], 1)
        u1 = jax.random.uniform(k1, cur.shape)
        slot = jnp.minimum((u1 * deg).astype(jnp.int32), deg - 1)
        u2 = jax.random.uniform(k2, cur.shape)
        flat = cur * self.max_deg + slot
        lo = jnp.take(self.lo.reshape(-1), flat)
        hi = jnp.take(self.hi.reshape(-1), flat)
        sp = jnp.take(self.split.reshape(-1), flat)
        return jnp.where(u2 < sp, lo, hi)

    def tree_flatten(self):
        return (self.lo, self.hi, self.split, self.deg), (self.n, self.max_deg)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        n, max_deg = aux
        lo, hi, split, deg = leaves
        return cls(n=n, max_deg=max_deg, lo=lo, hi=hi, split=split, deg=deg)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class CdfSampler:
    """Inverse-CDF fallback sampler (no table build; O(max_deg) per draw)."""

    n: int
    max_deg: int
    nbr: jnp.ndarray     # int32 [n, D]
    cdf: jnp.ndarray     # float32 [n, D] inclusive prefix sums
    deg: jnp.ndarray

    @staticmethod
    def from_device_graph(dg: DeviceGraph) -> "CdfSampler":
        cdf = jnp.cumsum(dg.prob, axis=1)
        # Saturate the last REAL slot (and all padding) to 1.0: uniform draws
        # live in [0, 1), so idx = sum(cdf < u) can never exceed deg-1 and a
        # float row sum slightly < 1 still resolves to the last edge.  This
        # bakes the degree clip into the table — the step needs no deg[cur]
        # gather (a flat scalar gather costs ~41 ms/step at bgp scale on
        # v5e, results/walk_probe.json — it was the r01->r02 regression).
        col = jnp.arange(dg.max_deg, dtype=jnp.int32)[None, :]
        last = jnp.maximum(dg.deg, 1)[:, None] - 1
        cdf = jnp.where(col >= last, jnp.float32(1.0), cdf)
        return CdfSampler(n=dg.n, max_deg=dg.max_deg, nbr=dg.nbr, cdf=cdf,
                          deg=dg.deg)

    def step(self, cur: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
        u = jax.random.uniform(key, cur.shape)
        rows = self.cdf[cur]                       # [W, D]
        # by construction cdf[v, deg[v]-1:] == 1.0 > u, so idx <= deg[v]-1
        idx = jnp.sum(rows < u[:, None], axis=1)
        return jnp.take_along_axis(self.nbr[cur], idx[:, None], axis=1)[:, 0]

    def tree_flatten(self):
        return (self.nbr, self.cdf, self.deg), (self.n, self.max_deg)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        n, max_deg = aux
        nbr, cdf, deg = leaves
        return cls(n=n, max_deg=max_deg, nbr=nbr, cdf=cdf, deg=deg)
