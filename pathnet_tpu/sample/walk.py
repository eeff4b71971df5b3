"""On-device path sampling — the gen_merw / gen_epoch_merw equivalent.

Reference semantics (gen_merw.cpp:182-207): for every epoch, for every start
node ``st``, ``num_walks`` walks of ``walk_len`` node records
``v0 = st, v_{i+1} ~ P(v_i, ·)`` plus the truncated-BFS hop distances
``d_i = dis[st][v_i] - 1``.  The C++ pipeline writes ~GBs of text that the
torch loop re-parses every epoch (PathNet_run.py:317-334); here an epoch's
``(paths, dists)`` tensors are produced directly in HBM by a jitted scan —
per-epoch regeneration ("gen_epoch mode") is a fresh fold of the PRNG key,
zero I/O, and reproducible (unlike the reference's ``srand(time(0))``).

TPU formulation notes (measured on v5e): the inverse-CDF sampler (row
gather + compare-sum) is ~2.7x faster than O(1) alias rolls because TPU row
gathers are vector loads while alias rolls are 4 scalar gathers per step;
distance resolution uses N1/N2 membership tests (``membership`` backend,
zero scalar gathers) instead of the [n, n] int8 table, which is
latency-bound at ~10M scalar gathers per epoch.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple, Union

import numpy as np

import jax
import jax.numpy as jnp

from ..data.graph import Graph, DeviceGraph
from .alias import AliasSampler, CdfSampler
from .distance import (bfs_distance_table, bfs_distance_table_host,
                       build_khop_tables, khop_dists, membership_dists)


def sample_paths(sampler: Union[AliasSampler, CdfSampler], key: jax.Array,
                 starts: jnp.ndarray, num_walks: int, walk_len: int
                 ) -> jnp.ndarray:
    """Walk tensor ``int32 [len(starts), num_walks, walk_len]``.

    One ``lax.scan`` over the ``walk_len - 1`` transitions; each step is a
    batched roll over all ``len(starts) * num_walks`` walkers.
    """
    S = starts.shape[0]
    cur = jnp.repeat(starts.astype(jnp.int32), num_walks)

    def step(cur, k):
        nxt = sampler.step(cur, k)
        return nxt, cur

    keys = jax.random.split(key, walk_len - 1) if walk_len > 1 else (
        jnp.zeros((0, 2), jnp.uint32))
    last, trail = jax.lax.scan(step, cur, keys)
    walk = jnp.concatenate([trail, last[None]], axis=0)  # [walk_len, W]
    return walk.T.reshape(S, num_walks, walk_len)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class PathSampler:
    """Bundled per-graph sampling state: transition tables + distances.

    Distance backends:
    - ``membership`` (default, walk_len <= 4): N1/N2 row-compare tests,
      O(n·D) memory — the TPU-fast path;
    - ``khop`` (default for walk_len >= 5): sorted exact-k-hop tables +
      searchsorted probes, O(n·Dk) memory — the memory-bounded path that
      makes the reference's length-5 ablation feasible at gen_epoch scale;
    - ``dense``: [n, n] int8 truncated-BFS table built on device;
    - ``host``: same table via the scipy oracle;
    - ``none``: no distances (dists=None).
    """

    num_walks: int
    walk_len: int
    sampler: Union[AliasSampler, CdfSampler]
    dist_table: Optional[jnp.ndarray]
    nbr: Optional[jnp.ndarray] = None    # [n, D] for membership mode
    deg: Optional[jnp.ndarray] = None    # [n]
    khop: Optional[tuple] = None         # sorted [n, Dk] tables, levels 1..L

    # -- construction -------------------------------------------------------

    @staticmethod
    def build(g: Graph, num_walks: int, walk_len: int, kind: str = "merw",
              sampler: str = "cdf", distance_backend: str = "auto",
              distance_chunk: int = 1024, add_self_loops: bool = True,
              pad_to: Optional[int] = None) -> "PathSampler":
        """From a host graph with per-record transition probabilities.

        ``kind='merw'`` uses ``g.prob`` as-is (the MERW pipeline);
        ``kind='uniform'`` symmetrizes + self-loops + uniform transition
        probabilities (gen.cpp:83-94 semantics, the RW-PathNet ablation).
        ``distance_backend='auto'`` picks ``membership`` for walk_len <= 4
        else ``dense``.
        """
        if kind == "uniform":
            g = g.symmetrized(add_self_loops=add_self_loops)
        dg = DeviceGraph.from_graph(g, pad_to)
        smp = (AliasSampler.from_device_graph(dg) if sampler == "alias"
               else CdfSampler.from_device_graph(dg))
        if distance_backend == "auto":
            distance_backend = "membership" if walk_len <= 4 else "khop"
        table = None
        nbr = deg = None
        khop = None
        if distance_backend == "membership":
            if walk_len > 4:
                raise ValueError("membership distances support walk_len <= 4; "
                                 "use distance_backend='khop'")
            nbr, deg = dg.nbr, dg.deg
        elif distance_backend == "khop":
            try:
                # memory guard: any one level's table capped at ~1 GiB
                # (beyond that the dense [n, n] table is no worse)
                max_width = max(64, (1 << 30) // (4 * g.n))
                khop = tuple(jnp.asarray(t) for t in build_khop_tables(
                    g, walk_len - 1, max_width=min(max_width, g.n)))
            except ValueError:
                table = bfs_distance_table(g, walk_len, distance_chunk)
        elif distance_backend == "dense":
            table = bfs_distance_table(g, walk_len, distance_chunk)
        elif distance_backend == "host":
            table = jnp.asarray(bfs_distance_table_host(g, walk_len))
        return PathSampler(num_walks=num_walks, walk_len=walk_len,
                           sampler=smp, dist_table=table, nbr=nbr, deg=deg,
                           khop=khop)

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
        if self.nbr is not None:
            dists = membership_dists(self.nbr, self.deg, starts, paths)
        elif self.khop is not None:
            dists = khop_dists(self.khop, starts, paths)
        elif self.dist_table is not None:
            # 2-D advanced indexing: a flattened index would overflow int32
            # for n > ~46k (n^2 > 2^31)
            dists = self.dist_table[starts[:, None, None], paths].astype(jnp.int32)
        else:
            dists = None
        return paths, dists

    def sample_epoch(self, base_key: jax.Array, epoch) -> tuple:
        """gen_epoch mode: a reproducible fresh path set per epoch."""
        return self.sample(jax.random.fold_in(base_key, epoch))

    # -- pytree -------------------------------------------------------------

    def tree_flatten(self):
        return ((self.sampler, self.dist_table, self.nbr, self.deg,
                 self.khop), (self.num_walks, self.walk_len))

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        num_walks, walk_len = aux
        sampler, dist_table, nbr, deg, khop = leaves
        return cls(num_walks=num_walks, walk_len=walk_len, sampler=sampler,
                   dist_table=dist_table, nbr=nbr, deg=deg, khop=khop)


def sample_epoch(ps: PathSampler, base_key: jax.Array, epoch):
    return ps.sample_epoch(base_key, epoch)
