"""Ring boundary-feature exchange — explicit ppermute pipeline.

The graph-partitioned mode shards node features row-wise over the ``data``
axis.  A sampled walk may visit any node (SURVEY.md §2.7: "a walk escapes
its home shard in ≤4 hops"), so the PAGG gather ``h[paths]`` needs features
owned by other shards.  GSPMD's default resolution is an all-gather of the
full ``[n, H]`` matrix on every device — correct, but peak memory O(n·H)
per device, which defeats the point of sharding.

This module implements the exchange as an explicit **ring**: each device
keeps only its own ``[n/d, H]`` block resident, and over ``d`` steps the
blocks rotate around the ring via ``lax.ppermute`` while each device
gathers the rows it needs from whichever block it currently holds.  Peak
memory is O(2·n/d·H) (current + in-flight block) and the permute for step
``s+1`` is issued *before* the gather for step ``s`` — XLA's async
collective-permute overlaps the ICI transfer with the local gather compute.

Differentiable: ``ppermute`` transposes to the inverse permutation and the
masked-accumulate gather transposes to a masked scatter-add, so the same
ring runs in the backward pass (rotating gradient blocks the other way).

No reference counterpart (the reference is single-GPU); this is the
TPU-native equivalent of the NCCL all-to-all a multi-GPU port would use.
"""
from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:
    from jax import shard_map
except ImportError:  # pragma: no cover — older jax
    from jax.experimental.shard_map import shard_map


def _ring_gather_local(block: jnp.ndarray, idx: jnp.ndarray,
                       axis_name: str) -> jnp.ndarray:
    """Per-shard body: gather global rows ``idx`` from the rotating ring.

    block [n/d, H] — this device's resident rows (global rows
    ``owner·bs .. owner·bs+bs``); idx [m] int32 global row ids.
    Returns [m, H].
    """
    d = jax.lax.psum(1, axis_name)
    me = jax.lax.axis_index(axis_name)
    bs = block.shape[0]
    out = jnp.zeros((idx.shape[0], block.shape[1]), block.dtype)
    # receive from the next device, send to the previous — after s permutes
    # this device holds the block originally owned by (me + s) % d
    perm = [((j + 1) % d, j) for j in range(d)]
    for s in range(d):
        nxt = jax.lax.ppermute(block, axis_name, perm) if s + 1 < d else None
        owner = (me + s) % d
        local = idx - owner * bs
        inb = (local >= 0) & (local < bs)
        rows = jnp.take(block, jnp.clip(local, 0, bs - 1), axis=0)
        out = out + jnp.where(inb[:, None], rows, 0)
        if nxt is not None:
            block = nxt
    return out


def make_ring_gather(mesh: Mesh, axis: str = "data"
                     ) -> Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]:
    """Build ``gather(h, idx) -> h[idx]`` where ``h`` stays ``data``-sharded.

    ``h`` [n, H] must have ``n`` divisible by the axis size (the padded-CSR
    graphs guarantee a padded row; callers pad to the mesh with
    :func:`pad_rows`).  ``idx`` may have any shape; its leading axis is the
    sharded batch axis and must also divide evenly.
    """
    d = mesh.shape[axis]
    body = functools.partial(_ring_gather_local, axis_name=axis)
    sm = shard_map(body, mesh=mesh,
                   in_specs=(P(axis, None), P(axis)),
                   out_specs=P(axis, None), check_vma=False)

    def gather(h: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
        shape = idx.shape
        hp, _ = pad_rows(h, d)                   # zero rows, never indexed
        flat, m = pad_rows(idx.reshape(-1), d)   # pad ids point at row 0
        out = sm(hp, flat)[:m]
        return out.reshape(*shape, h.shape[1])

    return gather


def pad_rows(x, multiple: int):
    """Pad axis 0 to a multiple (zero rows); returns (padded, orig_len)."""
    n = x.shape[0]
    pad = (-n) % multiple
    if pad == 0:
        return x, n
    widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, widths), n
