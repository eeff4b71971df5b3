"""SPMD mesh runtime — node/path-partitioned training over a device mesh.

No reference counterpart exists (the reference is strictly single-GPU,
SURVEY.md §2.7); this layer is the TPU-native scaling story:

- mesh axes ``('data', 'model')``: ``data`` partitions the *node/path*
  dimension (each device samples and aggregates paths for its node shard);
  ``model`` partitions hidden dimensions of the large matmuls (unused until
  hidden sizes warrant it).
- The transition tables (alias lo/hi/split), features X, and parameters are
  replicated; per-node tensors (paths, dists, per-node logits) are sharded
  on ``data``.  A path may visit any node, so the feature gather reads the
  replicated X locally — the all-to-all boundary exchange only becomes
  necessary when X itself is sharded (large-graph mode, planned).
- Gradients are summed across the mesh by XLA automatically (GSPMD): the
  loss is a mean over the sharded batch, so the backward pass inserts the
  psum — no hand-written collectives needed at this level.

Everything here works identically on a virtual CPU mesh
(``--xla_force_host_platform_device_count=N``), which is how tests and the
driver's multi-chip dry-run validate partitioning without a pod.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.pagg import PaggSpec, pagg_forward
from ..sample.walk import PathSampler


def make_mesh(n_devices: Optional[int] = None, data_axis: Optional[int] = None,
              model_axis: int = 1) -> Mesh:
    """Mesh over available devices; defaults to all-data-parallel."""
    devs = jax.devices()
    n = n_devices or len(devs)
    data_axis = data_axis or (n // model_axis)
    grid = np.array(devs[: data_axis * model_axis]).reshape(data_axis, model_axis)
    return Mesh(grid, ("data", "model"))


def shard_spec(mesh: Mesh, *axes: Optional[str]) -> NamedSharding:
    return NamedSharding(mesh, P(*axes))


def replicate(mesh: Mesh, tree):
    """Place a pytree fully replicated on the mesh."""
    s = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)


def param_shardings(params, mesh: Mesh) -> dict:
    """Model-axis (tensor-parallel) PartitionSpecs for a PAGG param tree.

    Hidden-dimension tensors of the encode pipeline (fc0, the wl distance
    linears, the RNN) are sharded over ``model`` on their last axis when it
    divides evenly; the small head (attw, fc2) stays replicated.  GSPMD
    propagates the shardings through the forward/backward and inserts the
    reduce-scatters/all-gathers — correctness is mesh-shape independent
    (tested against single-device in tests/test_parallel.py).
    """
    m = mesh.shape["model"]

    def rule(path_top, x):
        if path_top in ("attw", "fc2") or m <= 1:
            return P()
        if x.shape[-1] % m == 0:
            return P(*([None] * (x.ndim - 1) + ["model"]))
        return P()

    return {k: jax.tree_util.tree_map(lambda x, k=k: rule(k, x), v)
            for k, v in params.items()}


def sharded_train_step(mesh: Mesh, spec: PaggSpec, optimizer,
                       num_classes: int, shard_features: bool = False,
                       exchange: str = "gspmd", shard_params: bool = False,
                       params_example=None):
    """Build a jitted SPMD train+eval step.

    Signature of the returned fn:
      (params, opt_state, X, y, ps, train_idx, val_idx, key)
        -> (params, opt_state, loss, val_acc)

    ``train_idx``/``val_idx`` are padded to a multiple of the data-axis size
    by the caller; the per-epoch path tensor is sampled inside the step and
    constrained to the ``data`` sharding so sampling, gather, and the PAGG
    forward/backward all run node-partitioned.

    ``shard_features=True`` is the graph-partitioned mode: X lives sharded
    on the ``data`` axis (memory O(n·F/d) per device) and the cross-shard
    feature exchange for path gathers (a walk may visit any shard's nodes)
    is the TPU-native boundary all-to-all described in SURVEY.md §2.7.
    ``exchange`` picks its implementation: ``"gspmd"`` lets XLA insert an
    all-gather of the [n, H] transformed features (simple, O(n·H) peak);
    ``"ring"`` streams [n/d, H] blocks around a ppermute ring overlapped
    with the local gathers (O(n·H/d) peak — see parallel/ring.py);
    ``"sparse"`` is the ownership-keyed exchange — all-gather of the request
    ids + psum_scatter of the owned-row contributions, comms O(m·H) in the
    gathered row count instead of O(n·H) (see parallel/sparse.py for the
    regime table; wins for microbatches/serving, loses at full batch).

    ``shard_params=True`` additionally shards hidden-dimension parameters
    over the ``model`` axis (tensor parallelism; needs ``params_example``
    to derive the PartitionSpecs).
    """
    data_sharding = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    x_sharding = data_sharding if shard_features else repl
    if shard_params:
        if params_example is None:
            raise ValueError("shard_params=True needs params_example")
        pspec = param_shardings(params_example, mesh)
        p_sharding = jax.tree_util.tree_map(
            lambda s: NamedSharding(mesh, s), pspec,
            is_leaf=lambda x: isinstance(x, P))
    else:
        p_sharding = repl
    gather_fn = None
    if exchange == "ring":
        from .ring import make_ring_gather

        gather_fn = make_ring_gather(mesh, "data")
    elif exchange == "sparse":
        from .sparse import make_sparse_gather_sharded

        gather_fn = make_sparse_gather_sharded(mesh, "data")
    elif exchange != "gspmd":
        raise ValueError(f"unknown exchange {exchange!r}")

    def step(params, opt_state, X, y, ps: PathSampler, train_idx, val_idx, key):
        kp, kd = jax.random.split(key)
        # Shard the walk at its *source*: constraining the start nodes makes
        # GSPMD partition the whole sampling scan (each device walks only its
        # node shard).  Constraining only the result leaves the scan
        # replicated — every device samples all n nodes and keeps 1/d of the
        # output, an O(d) waste measured as superlinear blowup in
        # results/weak_scaling.json.  Values are unchanged (jax.random is
        # value-semantic under partitioning).
        starts = jax.lax.with_sharding_constraint(
            jnp.arange(ps.sampler.n, dtype=jnp.int32), data_sharding)
        paths, dists = ps.sample(kp, starts)
        paths = jax.lax.with_sharding_constraint(paths, data_sharding)
        dists = jax.lax.with_sharding_constraint(dists, data_sharding)

        def loss_fn(p):
            logits = pagg_forward(p, X, paths[train_idx], dists[train_idx],
                                  train_idx, spec, train=True, key=kd,
                                  gather_fn=gather_fn)
            labels = y[train_idx]
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, labels).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)

        logits = pagg_forward(params, X, paths[val_idx], dists[val_idx],
                              val_idx, spec, train=False, gather_fn=gather_fn)
        val_acc = jnp.mean((jnp.argmax(logits, -1) == y[val_idx]).astype(jnp.float32))
        return params, opt_state, loss, val_acc

    # opt_state mirrors params per-leaf but not per-tree (optax wraps it in
    # ScaleByAdamState etc.) — let it inherit its committed layout instead
    # of forcing a params-shaped spec on it
    o_in, o_out = (None, None) if shard_params else (repl, repl)
    return jax.jit(
        step,
        in_shardings=(p_sharding, o_in, x_sharding, repl, repl,
                      data_sharding, data_sharding, repl),
        out_shardings=(p_sharding, o_out, repl, repl),
    )
