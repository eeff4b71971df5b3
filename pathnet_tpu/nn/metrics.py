"""On-device classification metrics with sklearn semantics.

The reference computes macro-F1 / micro-F1 / macro-recall / macro-precision
/ accuracy on CPU via sklearn at every val-best (PathNet_run.py:384-389).
Here the confusion matrix is accumulated on device (one scatter-add per
eval) and the five metrics derive from it, matching sklearn's conventions:
zero-division → 0, macro averages taken over the label set present in
``y_true ∪ y_pred`` (sklearn's default ``labels=None``).
"""
from __future__ import annotations

from typing import Dict

import jax.numpy as jnp


def confusion_matrix(y_true: jnp.ndarray, y_pred: jnp.ndarray, num_classes: int,
                     weights: jnp.ndarray | None = None) -> jnp.ndarray:
    """cm[i, j] = (weighted) count of true class i predicted as j."""
    w = weights if weights is not None else jnp.ones_like(y_true, jnp.float32)
    # drop out-of-range labels (e.g. the -1 "unlabeled" sentinel) instead of
    # letting negative scatter indices silently wrap to the end of the matrix
    valid = (y_true >= 0) & (y_true < num_classes)
    w = jnp.where(valid, w, 0.0)
    idx = jnp.clip(y_true, 0, num_classes - 1) * num_classes + y_pred
    flat = jnp.zeros(num_classes * num_classes, jnp.float32).at[idx].add(w)
    return flat.reshape(num_classes, num_classes)


def classification_metrics(cm: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """accuracy, macro precision/recall/F1, micro F1 from a confusion matrix."""
    tp = jnp.diagonal(cm)
    row = cm.sum(axis=1)   # true counts
    col = cm.sum(axis=0)   # predicted counts
    total = cm.sum()
    present = ((row + col) > 0).astype(cm.dtype)
    denom_p = jnp.where(col > 0, col, 1.0)
    denom_r = jnp.where(row > 0, row, 1.0)
    prec = jnp.where(col > 0, tp / denom_p, 0.0)
    rec = jnp.where(row > 0, tp / denom_r, 0.0)
    pr = prec + rec
    f1 = jnp.where(pr > 0, 2.0 * prec * rec / jnp.where(pr > 0, pr, 1.0), 0.0)
    k = jnp.maximum(present.sum(), 1.0)
    acc = tp.sum() / jnp.maximum(total, 1.0)
    return {
        "accuracy": acc,
        "macro_precision": (prec * present).sum() / k,
        "macro_recall": (rec * present).sum() / k,
        "macro_f1": (f1 * present).sum() / k,
        "micro_f1": acc,   # multiclass micro-F1 == accuracy
    }
