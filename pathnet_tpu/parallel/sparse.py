"""Sparse boundary-feature exchange — ownership-keyed masked-contribution
all-reduce.

The third exchange mode for graph-partitioned features (SURVEY.md §2.7,
§7.3.5 "ownership-keyed all-to-all with bounded fan-out"), complementing
``gspmd`` (full all-gather) and ``ring`` (ppermute pipeline, parallel/ring.py):

- every shard owns a contiguous row block ``[n/d, H]`` of the feature matrix;
- for a gather ``h[idx]`` each shard computes the contribution of rows it
  owns — ``where(owner(idx) == me, block[idx - me*bs], 0)`` — a purely local
  ``[m, H]`` tensor;
- one ``psum`` over the mesh axis sums the d one-hot contributions into the
  exact gather result, replicated on every shard.

Communication per device is ``2·(d-1)/d · m·H`` words (bidirectional ring
all-reduce), independent of ``n`` — versus the ring exchange's
``(d-1)/d · n·H`` (it must rotate every resident block past every device)
and GSPMD's all-gather ``(d-1)/d · n·H`` (+ O(n·H) peak memory).

Regime analysis (m = number of gathered rows per shard):

| mode    | comms/device    | peak mem     | wins when              |
|---------|-----------------|--------------|------------------------|
| gspmd   | (d-1)/d·n·H     | O(n·H)       | small n (all resident) |
| ring    | (d-1)/d·n·H     | O(2·n/d·H)   | m ≳ n/2 (full-batch)   |
| sparse  | 2·(d-1)/d·m·H   | O(m·H)       | m ≲ n/2 (inference,    |
|         |                 |              |  small microbatches)   |

Full-batch PathNet training gathers m ≈ T·nw·wl ≈ 160·n/d rows per shard —
deep in ring territory.  Serving (``train/inference.py``) and microbatched
minibatch regimes gather m ≪ n — this mode.  The trade-off is measured, not
guessed: see ``tests/test_parallel.py`` for the equality tests and
``scripts/profile_exchange.py`` for on-mesh timings.

Differentiability: the body is gather-where-psum, all of which JAX
transposes natively (psum ↔ identity under shard_map's per-shard view with
replicated output; the masked gather transposes to a masked scatter-add
into the owner's block) — so it drops into ``pagg_forward(gather_fn=...)``
for training too.

No reference counterpart (the reference is single-GPU, SURVEY.md §2.7).
"""
from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
try:
    from jax import shard_map
except ImportError:  # pragma: no cover — older jax
    from jax.experimental.shard_map import shard_map

from .ring import pad_rows


def _sparse_gather_local(block: jnp.ndarray, idx: jnp.ndarray,
                         axis_name: str) -> jnp.ndarray:
    """Per-shard body: contribute owned rows, psum the one-hot pieces.

    block [n/d, H] — this device's resident rows (global rows
    ``me·bs .. me·bs+bs``); idx [m] int32 global row ids (replicated: every
    shard asks for the same rows and gets the full replicated answer).
    Returns [m, H].
    """
    me = jax.lax.axis_index(axis_name)
    bs = block.shape[0]
    local = idx - me * bs
    mine = (local >= 0) & (local < bs)
    rows = jnp.take(block, jnp.clip(local, 0, bs - 1), axis=0)
    contrib = jnp.where(mine[:, None], rows, 0)
    return jax.lax.psum(contrib, axis_name)


def make_sparse_gather(mesh: Mesh, axis: str = "data"
                       ) -> Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]:
    """Build ``gather(h, idx) -> h[idx]`` for ``data``-sharded ``h`` where
    the result is needed replicated (e.g. serving a small batch of nodes
    whose paths roam the whole sharded graph).

    ``idx`` may have any shape (flattened internally).  Rows of ``h`` beyond
    its true length (mesh padding) are zero and never indexed.
    """
    d = mesh.shape[axis]
    body = functools.partial(_sparse_gather_local, axis_name=axis)
    sm = shard_map(body, mesh=mesh,
                   in_specs=(P(axis, None), P()),
                   out_specs=P(), check_vma=False)

    def gather(h: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
        shape = idx.shape
        hp, _ = pad_rows(h, d)
        out = sm(hp, idx.reshape(-1).astype(jnp.int32))
        return out.reshape(*shape, h.shape[1])

    return gather


def _sparse_gather_sharded_local(block: jnp.ndarray, idx: jnp.ndarray,
                                 axis_name: str) -> jnp.ndarray:
    """Per-shard body for *sharded* requests: each shard asks for its own
    ``[ml]`` rows.  The request ids are all-gathered (cheap — ids, not
    features), every shard contributes the rows it owns to the full
    ``[d·ml, H]`` request list, and a ``psum_scatter`` sums the one-hot
    contributions while returning each shard exactly its own ``[ml, H]``
    slice — the reduce-scatter fuses the sum and the redistribution into
    one collective."""
    me = jax.lax.axis_index(axis_name)
    bs = block.shape[0]
    ids = jax.lax.all_gather(idx, axis_name, tiled=True)     # [d·ml]
    local = ids - me * bs
    mine = (local >= 0) & (local < bs)
    rows = jnp.take(block, jnp.clip(local, 0, bs - 1), axis=0)
    contrib = jnp.where(mine[:, None], rows, 0)              # [d·ml, H]
    return jax.lax.psum_scatter(contrib, axis_name,
                                scatter_dimension=0, tiled=True)


def make_sparse_gather_sharded(mesh: Mesh, axis: str = "data"
                               ) -> Callable[[jnp.ndarray, jnp.ndarray],
                                             jnp.ndarray]:
    """Build ``gather(h, idx) -> h[idx]`` where BOTH ``h`` and ``idx`` are
    ``data``-sharded and the result stays sharded like ``idx`` — the
    training-side exchange (``sharded_train_step(exchange="sparse")``).

    Per-device comms ≈ ``(d-1)·ml·H`` words for ``ml`` local requests
    (vs the ring's ``(d-1)/d·n·H``): wins when the *total* gathered rows
    ``d·ml`` are fewer than ``n`` — microbatched training and serving on
    large sharded graphs.  ``idx``'s leading axis must divide by the axis
    size; other axes are flattened into the request list.
    """
    d = mesh.shape[axis]
    body = functools.partial(_sparse_gather_sharded_local, axis_name=axis)
    sm = shard_map(body, mesh=mesh,
                   in_specs=(P(axis, None), P(axis)),
                   out_specs=P(axis, None), check_vma=False)

    def gather(h: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
        shape = idx.shape
        hp, _ = pad_rows(h, d)
        flat, m = pad_rows(idx.reshape(-1).astype(jnp.int32), d)
        out = sm(hp, flat)[:m]
        return out.reshape(*shape, h.shape[1])

    return gather


def exchange_comm_words(n: int, h: int, m: int, d: int) -> dict:
    """Analytic per-device communication volume (words) of the three
    boundary-exchange modes for a ``[n, h]`` sharded feature matrix and an
    ``m``-row gather on a ``d``-device axis.  Used by the profiling harness
    to sanity-check measured timings against the model."""
    if d <= 1:
        return {"gspmd": 0, "ring": 0, "sparse": 0, "sparse_sharded": 0}
    return {
        "gspmd": (d - 1) * (n // d) * h,
        "ring": (d - 1) * (n // d) * h,
        "sparse": 2 * (d - 1) * m * h // d,
        "sparse_sharded": (d - 1) * m * h,   # m = per-shard request count
    }
