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


@functools.partial(jax.jit, static_argnames=("spec", "num_ensemble"))
def predict(params, X: jnp.ndarray, ps: PathSampler, spec: PaggSpec,
            key: jax.Array, idx: Optional[jnp.ndarray] = None,
            num_ensemble: int = 1) -> jnp.ndarray:
    """Class log-probabilities for ``idx`` (default: all nodes).

    Paths are resampled per call; ``num_ensemble > 1`` averages predictions
    over independent path draws (reduces sampling variance at serve time —
    the reference implicitly relies on best-val selection instead).
    """
    if idx is None:
        idx = jnp.arange(X.shape[0], dtype=jnp.int32)

    def one(k):
        paths, dists = ps.sample(k)
        logits = pagg_forward(params, X, paths[idx], dists[idx], idx, spec,
                              train=False)
        return jax.nn.log_softmax(logits, axis=-1)

    keys = jax.random.split(key, num_ensemble)
    return jax.scipy.special.logsumexp(
        jax.vmap(one)(keys), axis=0) - jnp.log(num_ensemble)


def evaluate(params, X, y, ps: PathSampler, spec: PaggSpec, key: jax.Array,
             mask: np.ndarray, num_classes: int,
             num_ensemble: int = 1) -> Dict[str, float]:
    """The reference's five test metrics for an arbitrary node mask."""
    idx = jnp.asarray(np.flatnonzero(mask), jnp.int32)
    logp = predict(params, X, ps, spec, key, idx, num_ensemble)
    pred = jnp.argmax(logp, axis=-1)
    cm = confusion_matrix(y[idx], pred, num_classes)
    return {k: float(v) for k, v in classification_metrics(cm).items()}
