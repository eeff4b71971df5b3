"""Explicit inference API.

The reference has no serve path — evaluation is the training forward under
``no_grad`` (PathNet_run.py:355-389) and checkpoints are reloaded manually.
Here prediction is a first-class, jitted function over saved params.
"""
from __future__ import annotations

import functools
from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..models.pagg import PaggSpec, pagg_forward
from ..nn.metrics import classification_metrics, confusion_matrix
from ..sample.walk import PathSampler


@functools.partial(jax.jit,
                   static_argnames=("spec", "num_ensemble", "gather_fn"))
def predict(params, X: jnp.ndarray, ps: PathSampler, spec: PaggSpec,
            key: jax.Array, idx: Optional[jnp.ndarray] = None,
            gather_fn=None, num_ensemble: int = 1) -> jnp.ndarray:
    """Class log-probabilities for ``idx`` (default: all nodes).

    Walks are sampled only for the requested nodes (``O(|idx|·nw·wl)`` work,
    not ``O(n·nw·wl)``) and resampled per call; ``num_ensemble > 1``
    averages predictions over independent path draws (reduces sampling
    variance at serve time — the reference implicitly relies on best-val
    selection instead).  ``gather_fn`` overrides the cross-node feature
    gathers for sharded serving (see :func:`make_sharded_predict`).
    """
    if idx is None:
        idx = jnp.arange(X.shape[0], dtype=jnp.int32)

    def one(k):
        paths, dists = ps.sample(k, starts=idx)
        logits = pagg_forward(params, X, paths, dists, idx, spec,
                              train=False, gather_fn=gather_fn)
        return jax.nn.log_softmax(logits, axis=-1)

    keys = jax.random.split(key, num_ensemble)
    return jax.scipy.special.logsumexp(
        jax.vmap(one)(keys), axis=0) - jnp.log(num_ensemble)


def make_sharded_predict(mesh, spec: PaggSpec, num_ensemble: int = 1):
    """Serving on a mesh with graph-partitioned features.

    ``X`` stays row-sharded over the ``data`` axis (per-device memory
    O(n·F/d)); the request batch is replicated and the per-path feature
    fetches go through the ownership-keyed sparse exchange
    (``parallel/sparse.py`` — comms O(|idx|·nw·wl·H), independent of n,
    exactly the regime where serving batches are small relative to the
    graph).  Returns ``fn(params, X, ps, key, idx) -> log-probs``.
    """
    import numpy as _np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel.ring import pad_rows
    from ..parallel.sparse import make_sparse_gather

    d = mesh.shape["data"]
    gather = make_sparse_gather(mesh, "data")
    repl = NamedSharding(mesh, P())

    def fn(params, X, ps: PathSampler, key, idx):
        Xp, _ = pad_rows(jnp.asarray(X), d)   # pad rows are never indexed
        Xp = jax.device_put(Xp, NamedSharding(mesh, P("data", None)))
        params, ps, idx = jax.device_put(
            (params, ps, jnp.asarray(idx, jnp.int32)), repl)
        return predict(params, Xp, ps, spec, key, idx, gather,
                       num_ensemble=num_ensemble)

    return fn


def evaluate(params, X, y, ps: PathSampler, spec: PaggSpec, key: jax.Array,
             mask: np.ndarray, num_classes: int,
             num_ensemble: int = 1) -> Dict[str, float]:
    """The reference's five test metrics for an arbitrary node mask."""
    idx = jnp.asarray(np.flatnonzero(mask), jnp.int32)
    logp = predict(params, X, ps, spec, key, idx, num_ensemble=num_ensemble)
    pred = jnp.argmax(logp, axis=-1)
    cm = confusion_matrix(y[idx], pred, num_classes)
    return {k: float(v) for k, v in classification_metrics(cm).items()}
