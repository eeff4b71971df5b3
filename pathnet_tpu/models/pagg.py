"""PAGG — the path-aggregation layer family (PathNet / PathNet_homo).

Reference: PathNet_run.py:150-278.  Both variants share one pipeline:

  fc0 → gather path node features → distance-conditioned linear transform →
  (dropout) → RNN over the path sequence → path-vs-ego attention →
  aggregate over paths → concat ego → (dropout) → fc2

Variant differences (hetero = PathNet :150-211, homo = PathNet_homo
:214-278):

| step              | hetero                         | homo                  |
|-------------------|--------------------------------|-----------------------|
| after fc0         | identity                       | ReLU (:243)           |
| sequence order    | flipped (far→near, :182)       | as sampled            |
| after dist-select | identity                       | ReLU (:257)           |
| ego-per-path      | fc0 feats of position 0 (:199) | selected feats of position 0 (:259) |
| attention         | softmax(LeakyReLU(attw·cat)) over paths (:200-202) | (1 + attw·cat) residual (:270-271) |
| init              | torch defaults                 | + xavier on fc0/fc2 (:236-237) |

The distance-conditioned transform replaces the reference's
wl-GEMMs + stack + advanced-index (:186-192) with a batched einsum over the
stacked ``[wl, H, H]`` weight and a take_along_axis select — identical math,
one fused MXU-friendly op.

``quirk_compat=True`` reproduces two index-layout quirks of the reference
*hetero* forward byte-for-byte (the published heterophily numbers were
produced with them — SURVEY.md §2.4):

1. the flattening mismatch at :182-192 — distance indices are consumed
   b-major while the flipped sequence is laid out l-major, and the result is
   re-viewed b-major, scrambling (position, walk) pairs deterministically;
2. the walk-major mean misgrouping at :196-204 — ``h_n`` is reshaped
   ``[num_w, split]`` from node-major data, so the "mean over paths"
   averages stride-``split`` slices across all nodes.

The default implements the intended per-node semantics.

Ablation axes (paper table rows, performance.jpg): ``rnn ∈ {lstm, gru,
mlp}`` and ``agg ∈ {attention, mean, sum}``; ``kind='uniform'`` sampling at
the sampler level gives RW-PathNet.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..nn.cells import lstm_scan, gru_scan
from ..nn.init import (torch_linear_init, torch_lstm_init, xavier_uniform)
from ..nn.init import torch_gru_init


@dataclasses.dataclass(frozen=True)
class PaggSpec:
    """Static model hyperparameters (jit-static)."""

    feat_dim: int
    hidden: int
    out_dim: int
    walk_len: int
    variant: str = "hetero"      # "hetero" | "homo"
    rnn: str = "lstm"            # "lstm" | "gru" | "mlp"
    agg: str = "attention"       # "attention" | "mean" | "sum"
    dropout: float = 0.7
    quirk_compat: bool = False
    # rematerialize the gather→transform→RNN block under grad (trades ~2x
    # encode FLOPs for O(B·wl·H) activation memory).  Off by default:
    # measured 1.2x faster at bgp-standin scale with microbatching
    # (results/grad_probe2.json — the recompute re-pays the gather's
    # per-row latency, the true wall); run_protocol re-enables it for
    # large full-batch (non-microbatched) rounds where activations exceed
    # HBM.
    remat: bool = False
    # compute dtype for the encode pipeline (gather → distance transform →
    # RNN): "bfloat16" halves HBM traffic on the [B·wl, H] activations (the
    # hot path is bandwidth-bound, not FLOP-bound).  Params, the attention/
    # head, and all reductions stay float32; matmuls accumulate in float32
    # (MXU native bf16-in/f32-acc).  Default float32 = reference numerics.
    compute_dtype: str = "float32"
    # which table the per-path gather reads:
    #   "h"    — project X once, gather h rows (the reference's order,
    #            PathNet_run.py:176-179); the gather VJP is a scatter-add of
    #            ~B·wl H-rows into [n, H] — measured latency wall on TPU
    #            (results/grad_probe.json);
    #   "x"    — gather raw X rows, project after: nei = X[paths] @ W0.
    #            Identical math (matmul-gather commute row-wise), but X is
    #            constant so the VJP is dW0 = X[paths]^T @ dnei — NO scatter.
    #   "auto" — "x" unless the feature row is much wider than the hidden
    #            row (then the X-row gather bytes outweigh the scatter).
    gather_mode: str = "auto"
    # distance-select formulation (identical math, different XLA programs):
    #   "mask"   — wl masked [B,H]@[H,H] matmuls accumulated in place
    #              (one [B,H] temporary; the r1-r4 form)
    #   "onehot" — one-hot(dist)-gated expansion to [B, wl·H] contracted
    #              against the stacked weight in a single [B, wl·H]@[wl·H, H]
    #              MXU matmul (fewer, larger kernels)
    # default "onehot": measured ~9% faster on the full-train-set grad at
    # bgp scale (mask 491/510 ms vs onehot 448/463 ms at mb 8192/16384,
    # results/grad_probe3.json); f64-identical math (fp-order differs ~5e-4
    # in f32).  The quirk-compat golden path keeps "mask".
    dist_mode: str = "onehot"

    def resolved_gather_mode(self) -> str:
        if self.gather_mode != "auto":
            return self.gather_mode
        # TPU gathers cost per-ROW up to ~one (8,128) tile and per-BYTE
        # beyond (results/walk_probe.json: [2.56M,25] rows 29ms ≈ [2.56M,1]
        # 41ms; doubling width doubles time past a tile).  So gathering raw
        # X rows is free exactly when an X row fits the same tile as an h
        # row — then "x" drops the VJP scatter for nothing.
        return "x" if self.feat_dim <= 128 else "h"


def init_pagg_params(key: jax.Array, spec: PaggSpec, dtype=jnp.float32
                     ) -> Dict[str, Dict[str, jnp.ndarray]]:
    """Parameter pytree with torch-default initial distributions."""
    keys = jax.random.split(key, 6 + spec.walk_len)
    H = spec.hidden
    fc0 = torch_linear_init(keys[0], spec.feat_dim, H, dtype)
    fc2 = torch_linear_init(keys[1], 2 * H, spec.out_dim, dtype)
    if spec.variant == "homo":
        # PathNet_run.py:236-237 — xavier on the weights only
        fc0["w"] = xavier_uniform(keys[2], spec.feat_dim, H, dtype)
        fc2["w"] = xavier_uniform(keys[3], 2 * H, spec.out_dim, dtype)
    dist_layers = [torch_linear_init(k, H, H, dtype)
                   for k in keys[6:6 + spec.walk_len]]
    dist = {"w": jnp.stack([l["w"] for l in dist_layers]),
            "b": jnp.stack([l["b"] for l in dist_layers])}
    if spec.rnn == "lstm":
        rnn = torch_lstm_init(keys[4], H, H, dtype)
    elif spec.rnn == "gru":
        rnn = torch_gru_init(keys[4], H, H, dtype)
    else:  # mlp: position-mean + linear (our stand-in for the paper ablation)
        rnn = torch_linear_init(keys[4], H, H, dtype)
    attw = torch_linear_init(keys[5], 2 * H, 1, dtype)
    return {"fc0": fc0, "dist": dist, "rnn": rnn, "attw": attw, "fc2": fc2}


def _dropout(x, rate, train, key):
    if not train or rate <= 0.0 or key is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


def _dist_select(params, x_flat, dist_flat, walk_len, mode="mask"):
    """All wl linear transforms + per-element distance selection.

    x_flat [B, H], dist_flat [B] int → [B, H].  Same math as the reference's
    wl-GEMMs + stack + advanced-index (PathNet_run.py:186-192); two
    formulations (PaggSpec.dist_mode):

    - ``"mask"``: masked sum of per-layer transforms — peak memory one
      [B, H] temporary instead of the [B, wl, H] stack (which OOMs 64k-node
      graphs at full batch), but wl separate GEMMs.
    - ``"onehot"``: gate the input by one_hot(dist) into [B, wl·H] and
      contract against the stacked [wl·H, H] weight in one MXU matmul —
      ``out[b] = Σ_k 1[d_b=k]·x_b @ W_k`` exactly, fewer/larger kernels.
    """
    d = jnp.clip(dist_flat, 0, walk_len - 1)
    H_in = x_flat.shape[1]
    H_out = params["dist"]["w"].shape[2]
    if mode == "onehot":
        oh = jax.nn.one_hot(d, walk_len, dtype=x_flat.dtype)      # [B, wl]
        xe = (oh[:, :, None] * x_flat[:, None, :]).reshape(
            x_flat.shape[0], walk_len * H_in)
        w = params["dist"]["w"].reshape(walk_len * H_in, H_out)
        return xe @ w + oh @ params["dist"]["b"]
    out = jnp.zeros((x_flat.shape[0], H_out), x_flat.dtype)
    for k in range(walk_len):
        zk = x_flat @ params["dist"]["w"][k] + params["dist"]["b"][k]
        out = out + jnp.where((d == k)[:, None], zk, 0.0)
    return out


def _encode(params, seq, rnn):
    """seq [L, B, H] → h_n [B, H] (final hidden state)."""
    if rnn == "lstm":
        _, h_n = lstm_scan(params["rnn"], seq)
    elif rnn == "gru":
        _, h_n = gru_scan(params["rnn"], seq)
    else:
        h_n = jnp.mean(seq, axis=0) @ params["rnn"]["w"] + params["rnn"]["b"]
    return h_n


def pagg_forward(params, X: jnp.ndarray, paths: jnp.ndarray,
                 dists: jnp.ndarray, ego_idx: jnp.ndarray, spec: PaggSpec,
                 train: bool = False, key: Optional[jax.Array] = None,
                 gather_fn=None) -> jnp.ndarray:
    """Logits [T, out_dim] for target nodes ``ego_idx`` with walks ``paths``.

    X [n, F] all node features (transductive — reference gathers from the
    full feature matrix, PathNet_run.py:179); paths/dists [T, nw, wl].

    ``gather_fn(h, idx) -> h[idx]`` overrides the two cross-node feature
    gathers (path nodes + ego rows).  The SPMD graph-partitioned mode passes
    :func:`pathnet_tpu.parallel.ring.make_ring_gather` here so sharded
    features are exchanged over an explicit ppermute ring instead of a
    GSPMD all-gather.
    """
    T, nw, wl = paths.shape
    k1, k2 = (jax.random.split(key) if key is not None else (None, None))
    if gather_fn is None:
        gather_fn = lambda h, idx: h[idx]
    gm = spec.resolved_gather_mode()

    def project(rows, p=None):
        """fc0 on already-gathered rows ([..., F] → [..., H]); ``p``
        overrides the param tree (the bf16 encode path passes its casted
        copy so both callers share one body — ADVICE r4 #4)."""
        p = params if p is None else p
        z = rows @ p["fc0"]["w"] + p["fc0"]["b"]
        return jax.nn.relu(z) if spec.variant == "homo" else z

    need_h = gm == "h" or (spec.variant == "hetero" and spec.quirk_compat)
    if need_h:
        h = X @ params["fc0"]["w"] + params["fc0"]["b"]
        if spec.variant == "homo":
            h = jax.nn.relu(h)

    B = T * nw
    H = spec.hidden

    if spec.variant == "hetero" and spec.quirk_compat:
        return _hetero_quirk_forward(params, h, gather_fn(h, paths), dists,
                                     ego_idx, spec, train, k1, k2)

    cdt = jnp.bfloat16 if spec.compute_dtype == "bfloat16" else None

    def encode_block(params, table, paths, dists, k1):
        """gather → distance transform → RNN.  Rematerialized under grad
        (spec.remat): backward recomputes the [T, nw, wl, H] gather and the
        per-step LSTM gates instead of storing them — the difference between
        fitting and OOMing 64k-node full-batch training in 16G HBM.
        With compute_dtype=bfloat16 the whole block runs in bf16 (activations
        AND the dist/rnn weights), halving its HBM traffic; outputs are cast
        back to f32 for the attention/head.

        ``table`` is the projected feature matrix h (gather_mode "h") or raw
        X (mode "x" — gathered rows are projected here, so the gather has no
        VJP scatter; see PaggSpec.gather_mode)."""
        if cdt is not None:
            # cast the gather table itself: in "x" mode the [B·wl, F] raw-X
            # gather is the grad phase's dominant HBM stream — gathering
            # bf16 rows halves it (the f32 master X is untouched; only this
            # epoch-invariant view is cast)
            table = table.astype(cdt)
            params = dict(params)
            for k in ("dist", "rnn", "fc0"):
                params[k] = jax.tree_util.tree_map(
                    lambda x: x.astype(cdt), params[k])
        nei = gather_fn(table, paths)                # [T, nw, wl, H|F]
        if gm == "x":
            nei = project(jax.lax.stop_gradient(nei), params)
        if spec.variant == "hetero":
            seq_in = jnp.flip(nei, axis=2)
            d_in = jnp.flip(dists, axis=2)
        else:
            seq_in, d_in = nei, dists
        sel = _dist_select(params, seq_in.reshape(B * wl, H),
                           d_in.reshape(B * wl), wl,
                           mode=spec.dist_mode).reshape(T, nw, wl, H)
        if spec.variant == "homo":
            sel = jax.nn.relu(sel)
            ego_per_path = sel[:, :, 0, :]           # selected position-0 (:259)
        else:
            ego_per_path = nei[:, :, 0, :]           # fc0 feats of the start (:199)
        seq = sel.reshape(B, wl, H).transpose(1, 0, 2)   # [wl, B, H]
        seq = _dropout(seq, spec.dropout, train, k1)
        h_n = _encode(params, seq, spec.rnn).reshape(T, nw, H)
        if cdt is not None:
            h_n = h_n.astype(jnp.float32)
            ego_per_path = ego_per_path.astype(jnp.float32)
        return h_n, ego_per_path

    if spec.remat:
        encode_block = jax.checkpoint(encode_block)
    h_n, ego_per_path = encode_block(params, h if gm == "h" else X,
                                     paths, dists, k1)

    if spec.agg == "attention":
        cat = jnp.concatenate([h_n, ego_per_path], axis=-1)
        score = cat @ params["attw"]["w"] + params["attw"]["b"]
        if spec.variant == "hetero":
            # intended semantics: softmax-weighted SUM (the weights already
            # normalize over paths).  The reference takes a further mean
            # over the path axis (PathNet_run.py:203-204), scaling the path
            # branch 1/nw against the ego branch — under weight decay the
            # L2 equilibrium then caps what the path branch can contribute,
            # and the trained model ignores decodable path signal
            # (measured: 0.643 vs 0.704 on a planted-channel payload where
            # MLP=0.657 — results/attention_scale_probe.json).  The quirk
            # path reproduces the reference's mean scaling byte-for-byte.
            att = jax.nn.softmax(jax.nn.leaky_relu(score), axis=1)
            h_agg = jnp.sum(att * h_n, axis=1)
        else:
            att = 1.0 + score
            h_agg = jnp.mean(att * h_n, axis=1)
    elif spec.agg == "mean":
        h_agg = jnp.mean(h_n, axis=1)
    else:
        h_agg = jnp.sum(h_n, axis=1)

    ego = (gather_fn(h, ego_idx) if gm == "h"
           else project(jax.lax.stop_gradient(gather_fn(X, ego_idx))))
    out = jnp.concatenate([ego, h_agg], axis=-1)
    out = _dropout(out, spec.dropout, train, k2)
    return out @ params["fc2"]["w"] + params["fc2"]["b"]


def _hetero_quirk_forward(params, h, nei, dists, ego_idx, spec, train, k1, k2):
    """Byte-exact reproduction of the reference hetero forward's index
    layout (PathNet_run.py:172-211) for golden-parity testing."""
    T, nw, wl, H = nei.shape
    B = T * nw
    seq = nei.reshape(B, wl, H).transpose(1, 0, 2)        # [wl, B, H] (:180)
    flipped = jnp.flip(seq, axis=0)                       # (:182)
    flat_f = flipped.reshape(wl * B, H)                   # l-major layout
    lt_flat = dists.reshape(B * wl)                       # b-major layout (:184)
    sel = _dist_select(params, flat_f, lt_flat, wl)       # misaligned (:191)
    sel = sel.reshape(B, wl, H).transpose(1, 0, 2)        # re-viewed b-major (:192)
    sel = _dropout(sel, spec.dropout, train, k1)          # (:194)
    h_n = _encode(params, sel, spec.rnn)                  # [B, H] (:195)
    h_n = h_n.reshape(nw, T, H)                           # walk-major misgroup (:197)
    first = seq[0].reshape(nw, T, H)                      # (:199)
    cat = jnp.concatenate([h_n, first], axis=-1)
    score = cat @ params["attw"]["w"] + params["attw"]["b"]
    # F.softmax without dim on a 3-D tensor resolves to dim=0 (:200)
    att = jax.nn.softmax(jax.nn.leaky_relu(score), axis=0)
    h_agg = jnp.mean(att * h_n, axis=0)                   # (:203-204)
    out = jnp.concatenate([h[ego_idx], h_agg], axis=-1)
    out = _dropout(out, spec.dropout, train, k2)
    return out @ params["fc2"]["w"] + params["fc2"]["b"]
