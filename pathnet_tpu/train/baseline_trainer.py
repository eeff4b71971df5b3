"""Full-batch trainer for the baseline zoo.

Same best-on-validation protocol as the PAGG trainer (PathNet_run.py:
281-403) but with a plain transductive forward (no path sampling) — used to
reproduce the paper's comparison table rows (SURVEY.md §6.1).

BatchNorm follows torch semantics: train steps normalize with batch
statistics and advance running stats (momentum 0.1, unbiased var); the
val/test forwards normalize with the running stats.  The BN state is part
of the scan carry, and best-on-val model selection snapshots nothing BN-
related — matching torch, where eval immediately follows the train step on
the same module instance.
"""
from __future__ import annotations

import functools
from typing import Dict

import numpy as np

import jax
import jax.numpy as jnp
import optax

from ..config import TrainConfig
from ..models.baselines.zoo import (BaselineSpec, baseline_forward,
                                    baseline_forward_stateful,
                                    build_baseline_graphs, init_baseline,
                                    init_bn_state)
from ..nn.metrics import classification_metrics, confusion_matrix
from .trainer import RoundResult, make_optimizer


@functools.partial(jax.jit, static_argnames=("spec", "num_classes", "epochs",
                                             "optimizer"))
def _run_scan(params, opt_state, bn_state, X, y, graphs, train_idx, val_idx,
              test_idx, base_key, spec: BaselineSpec, num_classes: int,
              epochs: int, optimizer):
    def loss_fn(p, bn, key):
        logits, bn_new = baseline_forward_stateful(p, spec, X, graphs, bn,
                                                   train=True, key=key)
        ce = optax.softmax_cross_entropy_with_integer_labels(
            logits[train_idx], y[train_idx]).mean()
        return ce, bn_new

    def epoch_step(carry, epoch):
        params, opt_state, bn_state, best_val, best_cm = carry
        kd = jax.random.fold_in(base_key, epoch)
        grads, bn_state = jax.grad(loss_fn, has_aux=True)(params, bn_state, kd)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)

        logits, _ = baseline_forward_stateful(params, spec, X, graphs,
                                              bn_state, train=False)
        pred = jnp.argmax(logits, -1)
        val_cm = confusion_matrix(y[val_idx], pred[val_idx], num_classes)
        val_acc = jnp.diagonal(val_cm).sum() / jnp.maximum(val_cm.sum(), 1.0)
        is_best = val_acc > best_val
        test_cm = confusion_matrix(y[test_idx], pred[test_idx], num_classes)
        best_cm = jnp.where(is_best, test_cm, best_cm)
        best_val = jnp.maximum(best_val, val_acc)
        return (params, opt_state, bn_state, best_val, best_cm), val_acc

    init = (params, opt_state, bn_state, jnp.zeros(()),
            jnp.zeros((num_classes, num_classes)))
    (params, opt_state, bn_state, best_val, best_cm), hist = jax.lax.scan(
        epoch_step, init, jnp.arange(epochs))
    return best_val, best_cm, hist


def run_baseline_round(g, spec: BaselineSpec, cfg: TrainConfig,
                       train_mask, val_mask, test_mask, num_classes: int,
                       seed: int = 0, mesh=None) -> RoundResult:
    """One baseline round.  ``mesh`` runs the scan SPMD: X/y node-sharded
    over the mesh's ``data`` axis, params/edges replicated — GSPMD inserts
    the cross-shard collectives behind every spmm/segment op."""
    graphs = build_baseline_graphs(g, spec.name)
    X = jnp.asarray(g.features)
    y = jnp.asarray(g.labels)
    key = jax.random.PRNGKey(seed)
    kinit, kepochs = jax.random.split(key)
    params = init_baseline(kinit, spec)
    if spec.name == "lp":
        # MultiLP is parameterless: its "features" are the masked one-hot
        # train labels and a single forward is the whole model
        X = (jnp.eye(num_classes, dtype=jnp.float32)[y]
             * jnp.asarray(train_mask, jnp.float32)[:, None])
        logits = baseline_forward(params, spec, X, graphs, train=False)
        pred = jnp.argmax(logits, -1)
        vi = jnp.asarray(np.flatnonzero(val_mask), jnp.int32)
        ti = jnp.asarray(np.flatnonzero(test_mask), jnp.int32)
        val_cm = confusion_matrix(y[vi], pred[vi], num_classes)
        best_val = jnp.diagonal(val_cm).sum() / jnp.maximum(val_cm.sum(), 1.0)
        best_cm = confusion_matrix(y[ti], pred[ti], num_classes)
        metrics = {k: float(v) for k, v in
                   classification_metrics(best_cm).items()}
        return RoundResult(best_val_acc=float(best_val), metrics=metrics)
    optimizer = make_optimizer(cfg.lr, cfg.weight_decay)
    opt_state = optimizer.init(params)
    bn_state = init_bn_state(params)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        data_sharding = NamedSharding(mesh, P("data"))
        repl = NamedSharding(mesh, P())
        X = jax.device_put(X, data_sharding)
        y = jax.device_put(y, data_sharding)
        params = jax.device_put(params, repl)
        opt_state = jax.device_put(opt_state, repl)
        bn_state = jax.device_put(bn_state, repl)
        graphs = jax.device_put(graphs, repl)
    best_val, best_cm, hist = _run_scan(
        params, opt_state, bn_state, X, y, graphs,
        jnp.asarray(np.flatnonzero(train_mask), jnp.int32),
        jnp.asarray(np.flatnonzero(val_mask), jnp.int32),
        jnp.asarray(np.flatnonzero(test_mask), jnp.int32),
        kepochs, spec, num_classes, cfg.epochs, optimizer)
    metrics = {k: float(v) for k, v in classification_metrics(best_cm).items()}
    return RoundResult(best_val_acc=float(best_val), metrics=metrics)
