"""On-device path sampling — the gen_merw / gen_epoch_merw equivalent.

Reference semantics (gen_merw.cpp:182-207): for every epoch, for every start
node ``st``, ``num_walks`` walks of ``walk_len`` node records
``v0 = st, v_{i+1} ~ P(v_i, ·)`` plus the truncated-BFS hop distances
``d_i = dis[st][v_i] - 1``.  The C++ pipeline writes ~GBs of text that the
torch loop re-parses every epoch (PathNet_run.py:317-334); here an epoch's
``(paths, dists)`` tensors are produced directly in HBM by a jitted scan —
per-epoch regeneration ("gen_epoch mode") is a fresh fold of the PRNG key,
zero I/O, and reproducible (unlike the reference's ``srand(time(0))``).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Union

import numpy as np

import jax
import jax.numpy as jnp

from ..data.graph import Graph, DeviceGraph
from .alias import AliasSampler, CdfSampler
from .distance import bfs_distance_table, bfs_distance_table_host


def sample_paths(sampler: Union[AliasSampler, CdfSampler], key: jax.Array,
                 starts: jnp.ndarray, num_walks: int, walk_len: int
                 ) -> jnp.ndarray:
    """Walk tensor ``int32 [len(starts), num_walks, walk_len]``.

    One ``lax.scan`` over the ``walk_len - 1`` transitions; each step is a
    batched alias roll over all ``len(starts) * num_walks`` walkers.
    """
    S = starts.shape[0]
    cur = jnp.repeat(starts.astype(jnp.int32), num_walks)

    def step(cur, k):
        nxt = sampler.step(cur, k)
        return nxt, cur

    keys = jax.random.split(key, walk_len - 1) if walk_len > 1 else (
        jnp.zeros((0, 2), jnp.uint32))
    last, trail = jax.lax.scan(step, cur, keys)
    # trail: [walk_len-1, W] of the *previous* positions; append final node
    walk = jnp.concatenate([trail, last[None]], axis=0)  # [walk_len, W]
    return walk.T.reshape(S, num_walks, walk_len)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class PathSampler:
    """Bundled per-graph sampling state: transition tables + distances.

    ``dist_table`` is the [n, n] int8 truncated-BFS table when the dense
    backend is active, else None (distances must then be resolved by the
    caller via the host table).
    """

    num_walks: int
    walk_len: int
    sampler: Union[AliasSampler, CdfSampler]
    dist_table: Optional[jnp.ndarray]

    # -- construction -------------------------------------------------------

    @staticmethod
    def build(g: Graph, num_walks: int, walk_len: int, kind: str = "merw",
              sampler: str = "alias", distance_backend: str = "dense",
              distance_chunk: int = 1024, add_self_loops: bool = True,
              pad_to: Optional[int] = None) -> "PathSampler":
        """From a host graph with per-record transition probabilities.

        ``kind='merw'`` uses ``g.prob`` as-is (the MERW pipeline);
        ``kind='uniform'`` symmetrizes + self-loops + uniform transition
        probabilities (gen.cpp:83-94 semantics, the RW-PathNet ablation).
        """
        if kind == "uniform":
            g = g.symmetrized(add_self_loops=add_self_loops)
        dg = DeviceGraph.from_graph(g, pad_to)
        smp = (AliasSampler.from_device_graph(dg) if sampler == "alias"
               else CdfSampler.from_device_graph(dg))
        if distance_backend == "dense":
            table = bfs_distance_table(g, walk_len, distance_chunk)
        elif distance_backend == "host":
            table = jnp.asarray(bfs_distance_table_host(g, walk_len))
        else:
            table = None
        return PathSampler(num_walks=num_walks, walk_len=walk_len,
                           sampler=smp, dist_table=table)

    # -- sampling -----------------------------------------------------------

    def sample(self, key: jax.Array, starts: Optional[jnp.ndarray] = None):
        """One epoch's ``(paths, dists)`` for the given start nodes.

        ``paths``: int32 [S, num_walks, walk_len];
        ``dists``: int32 [S, num_walks, walk_len] — 0-based hop distance of
        each visited node from its start (the reference's ``o[_] - 1``,
        gen_merw.cpp:199-204).
        """
        if starts is None:
            starts = jnp.arange(self.sampler.n, dtype=jnp.int32)
        paths = sample_paths(self.sampler, key, starts, self.num_walks,
                             self.walk_len)
        if self.dist_table is None:
            return paths, None
        # 2-D advanced indexing: a flattened index would overflow int32 for
        # n > ~46k (n^2 > 2^31)
        dists = self.dist_table[starts[:, None, None], paths].astype(jnp.int32)
        return paths, dists

    def sample_epoch(self, base_key: jax.Array, epoch) -> tuple:
        """gen_epoch mode: a reproducible fresh path set per epoch."""
        return self.sample(jax.random.fold_in(base_key, epoch))

    # -- pytree -------------------------------------------------------------

    def tree_flatten(self):
        return (self.sampler, self.dist_table), (self.num_walks, self.walk_len)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        num_walks, walk_len = aux
        sampler, dist_table = leaves
        return cls(num_walks=num_walks, walk_len=walk_len, sampler=sampler,
                   dist_table=dist_table)


def sample_epoch(ps: PathSampler, base_key: jax.Array, epoch):
    return ps.sample_epoch(base_key, epoch)
