"""Training harness: the reference protocol as jitted on-device programs.

Reference loop (PathNet_run.py:281-403): per epoch — (re)load the epoch's
path set, full-batch forward on train-mask nodes, Adam step, val forward,
and on a val-accuracy improvement a test forward whose five metrics are the
round's result ("best-on-validation" model selection).  10 rounds with fresh
splits; mean ± std over rounds (:406-485).

TPU-native redesign: one round = ONE jitted ``lax.scan`` over epochs.  Each
scan step fuses on-device path sampling (the gen_epoch equivalent), the
training step, and the eval forwards; best-on-val selection is a functional
``where`` on device.  No host round-trips, no text files, no per-epoch
dispatch — the whole 1000-epoch round is a single XLA program.  A Python
stepper (``scan_epochs=False``) exists for debugging and for graphs whose
path tensors must be resampled in chunks.

Optimizer semantics match torch ``Adam(lr, weight_decay)`` — additive L2
before the moment update (NOT AdamW; the reference's AdamW line is
commented out, PathNet_run.py:293-296).
"""
from __future__ import annotations

import dataclasses
import functools
import time
from typing import Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax

from ..config import TrainConfig
from ..models.pagg import PaggSpec, init_pagg_params, pagg_forward
from ..nn.metrics import confusion_matrix, classification_metrics
from ..sample.walk import PathSampler


@dataclasses.dataclass
class RoundResult:
    best_val_acc: float
    metrics: Dict[str, float]          # accuracy/macro_f1/micro_f1/... at best val
    best_params: Optional[dict] = None
    history: Optional[np.ndarray] = None   # [epochs] val accuracy


def make_optimizer(lr: float, weight_decay: float) -> optax.GradientTransformation:
    """torch.optim.Adam(lr, weight_decay) — additive L2 into the gradient
    before Adam's moment accumulation."""
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.scale(-lr),
    )


def _loss_fn(params, X, paths, dists, idx, y, spec, key):
    logits = pagg_forward(params, X, paths, dists, idx, spec, train=True, key=key)
    return optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()


def _eval_cm(params, X, paths, dists, idx, y, spec, num_classes):
    logits = pagg_forward(params, X, paths, dists, idx, spec, train=False)
    pred = jnp.argmax(logits, axis=-1)
    return confusion_matrix(y, pred, num_classes)


def _pad_chunks(idx: np.ndarray, chunk: int):
    """Pad an index set to a multiple of ``chunk``; returns (idx [K, C],
    weights [K, C]) with padded entries weighted 0 (they index node 0)."""
    m = len(idx)
    k = max(1, -(-m // chunk))
    padded = np.zeros(k * chunk, np.int32)
    padded[:m] = idx
    w = np.zeros(k * chunk, np.float32)
    w[:m] = 1.0
    return padded.reshape(k, chunk), w.reshape(k, chunk)


def _shard(t, data_sharding):
    if data_sharding is None:
        return t
    return jax.lax.with_sharding_constraint(t, data_sharding)


def _chunked_grads(params, X, paths, dists, idx_chunks, y, w_chunks, spec, key,
                   data_sharding=None):
    """Full-batch gradients by microbatch accumulation (exact: CE mean over
    all weighted rows; grads sum over chunks inside a lax.scan, so only one
    chunk's activations are ever live)."""
    total = jnp.maximum(w_chunks.sum(), 1.0)

    def wsum_loss(p, idx_c, w_c, kd):
        logits = pagg_forward(p, X, _shard(paths[idx_c], data_sharding),
                              _shard(dists[idx_c], data_sharding), idx_c,
                              spec, train=True, key=kd)
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, y[idx_c])
        return jnp.sum(ce * w_c)

    zero = jax.tree_util.tree_map(jnp.zeros_like, params)

    def body(acc, inp):
        idx_c, w_c, i = inp
        kd = jax.random.fold_in(key, i)
        g = jax.grad(wsum_loss)(params, idx_c, w_c, kd)
        return jax.tree_util.tree_map(jnp.add, acc, g), None

    k = idx_chunks.shape[0]
    acc, _ = jax.lax.scan(body, zero,
                          (idx_chunks, w_chunks, jnp.arange(k)))
    return jax.tree_util.tree_map(lambda g: g / total, acc)


def _chunked_cm(params, X, paths, dists, idx_chunks, y, w_chunks, spec,
                num_classes, data_sharding=None):
    def body(cm, inp):
        idx_c, w_c = inp
        logits = pagg_forward(params, X, _shard(paths[idx_c], data_sharding),
                              _shard(dists[idx_c], data_sharding), idx_c,
                              spec, train=False)
        pred = jnp.argmax(logits, axis=-1)
        return cm + confusion_matrix(y[idx_c], pred, num_classes,
                                     weights=w_c), None
    cm, _ = jax.lax.scan(body, jnp.zeros((num_classes, num_classes)),
                         (idx_chunks, w_chunks))
    return cm


@functools.partial(
    jax.jit,
    static_argnames=("spec", "num_classes", "epochs", "optimizer",
                     "track_history", "microbatch", "data_sharding"))
def _run_round_scan(params, opt_state, X, y, ps: PathSampler,
                    train_idx, val_idx, test_idx, base_key,
                    spec: PaggSpec, num_classes: int, epochs: int,
                    optimizer, track_history: bool,
                    microbatch: Optional[int] = None,
                    data_sharding=None, epoch_start=0,
                    best_val=None, best_cm=None, best_params=None):
    """Scan ``epochs`` epochs starting at global epoch ``epoch_start``.

    ``epoch_start`` (traced) offsets the per-epoch fold_in keys, and the
    ``best_*`` carry can be threaded across calls — together these let
    run_round split a round into bounded device executions (scan_chunk)
    without changing the math: chunked == monolithic exactly, because epoch
    keys depend only on the global epoch id.
    """
    if microbatch is None:
        y_train, y_val, y_test = y[train_idx], y[val_idx], y[test_idx]
    else:
        # chunked index sets are prepared host-side by run_round:
        # each of train/val/test_idx is a ([K, C] indices, [K, C] weights) pair
        tr_c, tr_w = train_idx
        va_c, va_w = val_idx
        te_c, te_w = test_idx

    def epoch_step(carry, epoch):
        params, opt_state, best_val, best_cm, best_params = carry
        kp, kd = jax.random.split(jax.random.fold_in(base_key, epoch))
        if data_sharding is not None:
            # SPMD: shard the walk at its source — constraining the start
            # nodes partitions the whole sampling scan (each device walks
            # only its node shard; constraining only the result leaves the
            # scan replicated on every device).  Everything derived from the
            # node axis — gathers, encode, logits — inherits the partition.
            starts = jax.lax.with_sharding_constraint(
                jnp.arange(ps.sampler.n, dtype=jnp.int32), data_sharding)
            paths, dists = ps.sample(kp, starts)
            paths = jax.lax.with_sharding_constraint(paths, data_sharding)
            dists = jax.lax.with_sharding_constraint(dists, data_sharding)
        else:
            paths, dists = ps.sample(kp)

        if microbatch is None:
            grads = jax.grad(_loss_fn)(params,
                                       X, _shard(paths[train_idx], data_sharding),
                                       _shard(dists[train_idx], data_sharding),
                                       train_idx, y_train, spec, kd)
        else:
            grads = _chunked_grads(params, X, paths, dists, tr_c, y, tr_w,
                                   spec, kd, data_sharding)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)

        if microbatch is None:
            val_cm = _eval_cm(params, X, _shard(paths[val_idx], data_sharding),
                              _shard(dists[val_idx], data_sharding),
                              val_idx, y_val, spec, num_classes)
        else:
            val_cm = _chunked_cm(params, X, paths, dists, va_c, y, va_w,
                                 spec, num_classes, data_sharding)
        val_acc = jnp.diagonal(val_cm).sum() / jnp.maximum(val_cm.sum(), 1.0)
        is_best = val_acc > best_val

        def test_eval():
            if microbatch is None:
                return _eval_cm(params, X, _shard(paths[test_idx], data_sharding),
                                _shard(dists[test_idx], data_sharding),
                                test_idx, y_test, spec, num_classes)
            return _chunked_cm(params, X, paths, dists, te_c, y, te_w, spec,
                               num_classes, data_sharding)

        test_cm = jax.lax.cond(is_best, test_eval, lambda: best_cm)
        best_cm = jnp.where(is_best, test_cm, best_cm)
        best_val = jnp.maximum(best_val, val_acc)
        best_params = jax.tree_util.tree_map(
            lambda b, p: jnp.where(is_best, p, b), best_params, params)
        out = val_acc if track_history else jnp.zeros(())
        return (params, opt_state, best_val, best_cm, best_params), out

    if best_val is None:
        best_val = jnp.zeros(())
    if best_cm is None:
        best_cm = jnp.zeros((num_classes, num_classes))
    if best_params is None:
        best_params = params
    init = (params, opt_state, best_val, best_cm, best_params)
    (params, opt_state, best_val, best_cm, best_params), hist = jax.lax.scan(
        epoch_step, init, epoch_start + jnp.arange(epochs))
    return params, opt_state, best_val, best_cm, best_params, hist


def run_round(X: jnp.ndarray, y: jnp.ndarray, ps: PathSampler, spec: PaggSpec,
              cfg: TrainConfig, train_mask: np.ndarray, val_mask: np.ndarray,
              test_mask: np.ndarray, num_classes: int, seed: int = 0,
              track_history: bool = False, keep_params: bool = False,
              mesh=None, shard_features: bool = False) -> RoundResult:
    """One full round: init → epochs → best-on-val test metrics.

    ``mesh`` runs the whole round scan SPMD over the mesh's ``data`` axis:
    the per-epoch path tensor, the gathered batch, and every forward/backward
    are node-partitioned; gradients psum automatically (GSPMD inserts the
    collective behind the mean-loss).  ``shard_features=True`` additionally
    row-shards X (graph-partitioned mode — the cross-shard feature exchange
    for path gathers is the boundary all-to-all of SURVEY.md §2.7, inserted
    by GSPMD).  No reference counterpart (single-GPU, SURVEY §2.7).
    """
    key = jax.random.PRNGKey(seed)
    kinit, kepochs = jax.random.split(key)
    params = init_pagg_params(kinit, spec)
    optimizer = make_optimizer(cfg.lr, cfg.weight_decay)
    opt_state = optimizer.init(params)

    data_sharding = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        data_sharding = NamedSharding(mesh, P("data"))
        repl = NamedSharding(mesh, P())
        params = jax.device_put(params, repl)
        opt_state = jax.device_put(opt_state, repl)
        X = jax.device_put(X, data_sharding if shard_features else repl)
        y = jax.device_put(y, repl)
        ps = jax.tree_util.tree_map(lambda a: jax.device_put(a, repl), ps)

    train_idx = jnp.asarray(np.flatnonzero(train_mask), jnp.int32)
    val_idx = jnp.asarray(np.flatnonzero(val_mask), jnp.int32)
    test_idx = jnp.asarray(np.flatnonzero(test_mask), jnp.int32)
    if cfg.microbatch is not None:
        train_idx, val_idx, test_idx = (
            tuple(jnp.asarray(a) for a in _pad_chunks(np.asarray(i),
                                                      cfg.microbatch))
            for i in (train_idx, val_idx, test_idx))

    if cfg.scan_epochs:
        # bounded device executions: chunk the epoch scan so one device call
        # never runs unboundedly long (multi-minute single executions can
        # trip runtime watchdogs / preemptions), threading the best-on-val
        # carry across chunks — chunked == monolithic exactly
        chunk = min(cfg.scan_chunk or cfg.epochs, cfg.epochs)
        best_val = jnp.zeros(())
        best_cm = jnp.zeros((num_classes, num_classes))
        best_params = params
        hists = []
        start = 0
        while start < cfg.epochs:
            e = min(chunk, cfg.epochs - start)
            (params, opt_state, best_val, best_cm, best_params,
             hist) = _run_round_scan(
                params, opt_state, X, y, ps, train_idx, val_idx, test_idx,
                kepochs, spec, num_classes, e, optimizer, track_history,
                cfg.microbatch, data_sharding, jnp.int32(start),
                best_val, best_cm, best_params)
            if track_history:
                hists.append(np.asarray(hist))
            start += e
        hist = np.concatenate(hists) if track_history else hist
    else:
        if cfg.microbatch is not None:
            raise NotImplementedError(
                "microbatch accumulation requires scan_epochs=True")
        params, best_val, best_cm, best_params, hist = _run_round_python(
            params, opt_state, X, y, ps, train_idx, val_idx, test_idx,
            kepochs, spec, num_classes, cfg.epochs, optimizer, track_history)

    metrics = {k: float(v) for k, v in
               classification_metrics(best_cm).items()}
    return RoundResult(
        best_val_acc=float(best_val),
        metrics=metrics,
        best_params=jax.device_get(best_params) if keep_params else None,
        history=np.asarray(hist) if track_history else None)


def _run_round_python(params, opt_state, X, y, ps, train_idx, val_idx,
                      test_idx, base_key, spec, num_classes, epochs,
                      optimizer, track_history):
    """Python-loop fallback: one jitted step per epoch (debuggable; used for
    graphs whose per-epoch tensors need host-side staging)."""

    @functools.partial(jax.jit, static_argnames=())
    def one_epoch(params, opt_state, epoch, best_val, best_cm, best_params):
        kp, kd = jax.random.split(jax.random.fold_in(base_key, epoch))
        paths, dists = ps.sample(kp)
        grads = jax.grad(_loss_fn)(params, X, paths[train_idx], dists[train_idx],
                                   train_idx, y[train_idx], spec, kd)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        val_cm = _eval_cm(params, X, paths[val_idx], dists[val_idx], val_idx,
                          y[val_idx], spec, num_classes)
        val_acc = jnp.diagonal(val_cm).sum() / jnp.maximum(val_cm.sum(), 1.0)
        is_best = val_acc > best_val
        test_cm = jax.lax.cond(
            is_best,
            lambda: _eval_cm(params, X, paths[test_idx], dists[test_idx],
                             test_idx, y[test_idx], spec, num_classes),
            lambda: best_cm)
        best_cm = jnp.where(is_best, test_cm, best_cm)
        best_val = jnp.maximum(best_val, val_acc)
        best_params = jax.tree_util.tree_map(
            lambda b, p: jnp.where(is_best, p, b), best_params, params)
        return params, opt_state, best_val, best_cm, best_params, val_acc

    best_val = jnp.zeros(())
    best_cm = jnp.zeros((num_classes, num_classes))
    best_params = params
    hist = []
    for e in range(epochs):
        params, opt_state, best_val, best_cm, best_params, val_acc = one_epoch(
            params, opt_state, e, best_val, best_cm, best_params)
        if track_history:
            hist.append(float(val_acc))
    return params, best_val, best_cm, best_params, (
        jnp.asarray(hist) if track_history else jnp.zeros(()))


def run_protocol(name: str, data_root: str = "data",
                 cfg: Optional[TrainConfig] = None,
                 num_walks: int = 40, walk_len: int = 4, hidden: int = 64,
                 kind: str = "merw", rnn: str = "lstm", agg: str = "attention",
                 quirk_compat: bool = False, rounds: Optional[int] = None,
                 dropout: float = 0.7, ckpt_dir: Optional[str] = None,
                 verbose: bool = True, mesh=None, shard_features: bool = False,
                 compute_dtype: str = "float32", remat: str = "auto",
                 ) -> Tuple[Dict[str, Tuple[float, float]], list]:
    """The reference's multi-round CLI driver (PathNet_run.py:406-485).

    Loads the dataset, attaches MERW probabilities, builds the on-device
    sampler once (paths regenerate per epoch inside the round scan), runs
    ``rounds`` rounds with per-round splits, and returns
    (mean/std aggregate, per-round results).  With ``ckpt_dir`` set, each
    round's best params + metrics are checkpointed and completed rounds are
    skipped on re-run (resume — absent from the reference, SURVEY.md §5).
    """
    from ..data.registry import DATASETS, load_dataset, payload_fingerprint
    from ..merw import merw_graph_per_component
    from .checkpoint import load_round, save_round
    from .results import aggregate_rounds

    cfg = cfg or TrainConfig()
    rounds = rounds if rounds is not None else cfg.rounds
    spec_d = DATASETS[name]
    variant = "homo" if spec_d.variant == "homo" else "hetero"
    # checkpoints are only resumable into an identical protocol: key the
    # directory by payload fingerprint + the config knobs that change the
    # math, so a recalibrated stand-in or different epoch count can never
    # silently resume stale rounds (r3's comparison-resume bug, one level
    # down)
    ckpt_name = (f"{name}.{payload_fingerprint(spec_d)}.e{cfg.epochs}"
                 f".h{hidden}.s{cfg.seed}.nw{num_walks}.wl{walk_len}"
                 f".dr{dropout}.{kind}.{rnn}.{agg}"
                 + ("" if compute_dtype == "float32" else f".{compute_dtype}")
                 + (".quirk" if quirk_compat else ""))

    results = []
    ps = None
    for round_i in range(rounds):
        if ckpt_dir is not None:
            prev = load_round(ckpt_dir, ckpt_name, round_i)
            if prev is not None:
                results.append(RoundResult(
                    best_val_acc=prev["meta"]["best_val_acc"],
                    metrics=prev["meta"]["metrics"]))
                if verbose:
                    print(f"round {round_i}: resumed from checkpoint "
                          f"(acc={prev['meta']['metrics']['accuracy']:.4f})")
                continue
        g, train_mask, val_mask, test_mask, _ = load_dataset(
            name, data_root, round_i)
        if ps is None:
            if kind == "merw" and not (g.prob < 1.0).any():
                # per-component: SBM stand-ins can have isolated nodes, and
                # a global eigenvector yields psi=0 -> NaN probabilities on
                # minor components (the reference preprocessing's own bug)
                g = merw_graph_per_component(g)
            ps = PathSampler.build(g, num_walks, walk_len, kind=kind)
            X = jnp.asarray(g.features)
            y = jnp.asarray(g.labels)
            # remat only when a big batch runs un-microbatched (activations
            # O(B·wl·H) would exceed HBM); microbatched rounds run faster
            # without it (results/grad_probe2.json).  "on"/"off" force it.
            need_remat = (cfg.microbatch is None
                          and g.n * num_walks * walk_len > 20_000_000)
            if remat != "auto":
                need_remat = remat == "on"
            spec = PaggSpec(feat_dim=g.features.shape[1], hidden=hidden,
                            out_dim=spec_d.num_classes, walk_len=walk_len,
                            variant=variant, rnn=rnn, agg=agg, dropout=dropout,
                            quirk_compat=quirk_compat,
                            compute_dtype=compute_dtype, remat=need_remat)
        t_round = time.time()
        res = run_round(X, y, ps, spec, cfg, train_mask, val_mask, test_mask,
                        spec_d.num_classes, seed=cfg.seed + round_i,
                        keep_params=ckpt_dir is not None, mesh=mesh,
                        shard_features=shard_features)
        if ckpt_dir is not None:
            save_round(ckpt_dir, ckpt_name, round_i, res)
            res.best_params = None
        if verbose:
            print(f"round {round_i}: val={res.best_val_acc:.4f} "
                  f"acc={res.metrics['accuracy']:.4f} "
                  f"[{time.time() - t_round:.1f}s]", flush=True)
        results.append(res)
    return aggregate_rounds(results), results
