"""Correct & Smooth post-processing and label propagation.

Reference: baseline/Mixhop/correct_smooth.py (C&S) and the MultiLP model in
baseline/Mixhop/models.py — propagation-only methods layered on a base
predictor's soft outputs.
"""
from __future__ import annotations

import jax.numpy as jnp

from .ops import EdgeGraph, spmm


def label_propagation(eg: EdgeGraph, y_onehot: jnp.ndarray,
                      train_mask: jnp.ndarray, alpha: float = 0.9,
                      iters: int = 50) -> jnp.ndarray:
    """MultiLP: Z ← α Â Z + (1-α) Y0, train rows clamped to true labels."""
    y0 = jnp.where(train_mask[:, None], y_onehot, 0.0)
    z = y0
    for _ in range(iters):
        z = alpha * spmm(eg, z) + (1 - alpha) * y0
        z = jnp.where(train_mask[:, None], y_onehot, z)
    return z


def correct_and_smooth(eg: EdgeGraph, soft: jnp.ndarray, y_onehot: jnp.ndarray,
                       train_mask: jnp.ndarray, alpha1: float = 0.979,
                       alpha2: float = 0.756, iters: int = 50,
                       scale: float = 20.0) -> jnp.ndarray:
    """Two-stage C&S (correct_smooth.py semantics).

    Correct: propagate train residuals E = Y - soft with Z ← α1 Â Z,
    rescale and add.  Smooth: clamp train rows to labels and propagate with
    α2.  Returns refined soft predictions.
    """
    err = jnp.where(train_mask[:, None], y_onehot - soft, 0.0)
    z = err
    for _ in range(iters):
        z = alpha1 * spmm(eg, z) + (1 - alpha1) * err
    soft = soft + scale * z

    guess = jnp.where(train_mask[:, None], y_onehot, soft)
    z = guess
    for _ in range(iters):
        z = alpha2 * spmm(eg, z) + (1 - alpha2) * guess
        z = jnp.where(train_mask[:, None], y_onehot, z)
    return z
