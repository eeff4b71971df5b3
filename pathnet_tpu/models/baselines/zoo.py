"""The baseline zoo — JAX re-designs of the reference's comparison models.

Reference: ``baseline/`` (SURVEY.md §2.6) — MLP, GCN, GAT, GraphSAGE, GIN,
SGC, FAGCN (flat files), H2GCN, MixHop, GPRGNN/APPNP (vendored suites).
Each model is a pure (init, forward) pair over EdgeGraph sparse ops; the
shared full-batch trainer lives in train/baseline_trainer.py.

Architectural choices follow the reference configurations:
- gcn.py:5-30    — GCNConv stack + BatchNorm + ReLU
- gat.py:5-31    — multi-head GATConv concat + BatchNorm
- graphsage2.py  — SAGEConv (mean aggregator + root linear)
- gin.py:8-49    — GINConv over 2-layer MLPs with learnable eps
- sgc.py:5-13    — single k-hop SGConv
- mlp.py:4-33    — Linear + BatchNorm stack
- FAGCN/fagcn.py — eps-residual frequency-adaptive conv
- Mixhop/models.py:H2GCN / MixHop / GPR_prop / APPNP_Net — concat-hops,
  powers-of-Â concat, and generalized-PageRank propagation
"""
from __future__ import annotations

import dataclasses
import math
from typing import Dict, Optional

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from ...data.graph import Graph
from ...nn.init import torch_linear_init, uniform_bound
from .ops import BatchNormCtx, EdgeGraph, segment_softmax, spmm


@dataclasses.dataclass(frozen=True)
class BaselineSpec:
    name: str
    feat_dim: int
    hidden: int
    out_dim: int
    num_layers: int = 2
    heads: int = 8            # GAT
    dropout: float = 0.5
    k_hops: int = 2           # SGC / MixHop / GPR
    alpha: float = 0.1        # APPNP / GPR teleport
    eps: float = 0.3          # FAGCN residual
    n_nodes: int = 0          # LINK (adjacency-row regression)
    # compute dtype for the forward (weights + activations except BN, which
    # keeps f32 statistics); "bfloat16" halves HBM traffic on the spmm-bound
    # hot path.  float32 = reference numerics.
    compute_dtype: str = "float32"


BASELINES = ("mlp", "gcn", "gat", "sage", "sage1", "gin", "sgc", "fagcn",
             "h2gcn", "mixhop", "gprgnn", "appnp", "link", "gcnjk", "gatjk",
             "cheb", "lp")
# sage  — PyG SAGEConv (graphsage2.py): lin_l(mean_N(x)) + lin_r(x)
# sage1 — custom my_SAGEConv (graphsage.py:37-62): mean over N(i)∪{i} of
#          lin_l(x), plus lin_r(x)
# gatjk — Mixhop models.py:399-451: GAT stack, max-jumping-knowledge, linear
# cheb  — GPRGNN GNN_models_h2gcn.py:139-155: two ChebConv(K=2) layers
# lp    — MultiLP label propagation (Mixhop models.py:206-258), parameterless

# extra zoo members accepted by init/forward but not part of the default
# comparison column (the reference never runs them in the headline table):
# sgcmem — SGCMem (Mixhop models.py:114-160): linear FIRST (F→C), then
#          k_hops sym-normalized propagations — the memory-light SGC order
EXTRA_MODELS = ("sgcmem",)


# ---------------------------------------------------------------------------
# graph preparation
# ---------------------------------------------------------------------------

def build_baseline_graphs(g: Graph, name: str) -> Dict[str, EdgeGraph]:
    """Per-model adjacency variants (host-built once per graph)."""
    graphs: Dict[str, EdgeGraph] = {}
    if name in ("gcn", "sgc", "sgcmem", "mixhop", "gprgnn", "appnp", "gcnjk",
                "lp"):
        graphs["sym"] = EdgeGraph.from_graph(g, norm="sym", add_self_loops=True)
    if name == "link":
        graphs["raw"] = EdgeGraph.from_graph(g, norm="none", add_self_loops=False)
    if name in ("gat", "gin", "fagcn", "gatjk"):
        graphs["raw"] = EdgeGraph.from_graph(g, norm="none",
                                             add_self_loops=name in ("gat", "gatjk"))
    if name == "sage":
        graphs["mean"] = EdgeGraph.from_graph(g, norm="rw", add_self_loops=False)
    if name == "sage1":
        # my_SAGEConv removes then re-adds self-loops before the mean
        graphs["mean_sl"] = EdgeGraph.from_graph(g, norm="rw", add_self_loops=True)
    if name in ("fagcn", "cheb"):
        graphs["symnl"] = EdgeGraph.from_graph(g, norm="sym", add_self_loops=False)
    if name == "lp":
        # gcn_norm with add_self_loops=False (Mixhop models.py:223-224)
        graphs["symnl"] = EdgeGraph.from_graph(g, norm="sym", add_self_loops=False)
    if name == "h2gcn":
        a = g.to_adjacency(binary=True)
        a = a.maximum(a.T)
        a.setdiag(0)
        a.eliminate_zeros()
        a2 = (a @ a).tocsr()
        a2.setdiag(0)
        a2.data = np.ones_like(a2.data)
        a2 = a2 - a2.multiply(a)          # strict 2-hop
        a2.eliminate_zeros()
        graphs["h1"] = EdgeGraph.from_graph(Graph.from_scipy(a), norm="sym",
                                            add_self_loops=False)
        graphs["h2"] = EdgeGraph.from_graph(Graph.from_scipy(a2), norm="sym",
                                            add_self_loops=False)
    if name == "mixhop":
        graphs["sym"] = EdgeGraph.from_graph(g, norm="sym", add_self_loops=True)
    return graphs


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _bn_params(dim):
    return {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))}


def init_baseline(key: jax.Array, spec: BaselineSpec) -> dict:
    ks = list(jax.random.split(key, 16 + 4 * spec.num_layers))
    F, H, C, L = spec.feat_dim, spec.hidden, spec.out_dim, spec.num_layers
    nm = spec.name
    p: dict = {}
    if nm == "mlp":
        dims = [F] + [H] * (L - 1) + [C]
        p["lins"] = [torch_linear_init(ks[i], dims[i], dims[i + 1])
                     for i in range(L)]
        p["bns"] = [_bn_params(H) for _ in range(L - 1)]
    elif nm == "gcn":
        dims = [F] + [H] * (L - 1) + [C]
        p["lins"] = [torch_linear_init(ks[i], dims[i], dims[i + 1])
                     for i in range(L)]
        p["bns"] = [_bn_params(H) for _ in range(L - 1)]
    elif nm == "gat":
        hd = spec.heads
        p["lins"] = [torch_linear_init(ks[0], F, H * hd)]
        p["att"] = [{"a_src": uniform_bound(ks[1], (hd, H), 1.0 / math.sqrt(H)),
                     "a_dst": uniform_bound(ks[2], (hd, H), 1.0 / math.sqrt(H))}]
        for i in range(1, L):
            out = C if i == L - 1 else H * hd
            nheads = 1 if i == L - 1 else hd
            hdim = C if i == L - 1 else H
            p["lins"].append(torch_linear_init(ks[3 + 2 * i], H * hd, hdim * nheads))
            p["att"].append({"a_src": uniform_bound(ks[4 + 2 * i], (nheads, hdim),
                                                    1.0 / math.sqrt(hdim)),
                             "a_dst": uniform_bound(ks[5 + 2 * i], (nheads, hdim),
                                                    1.0 / math.sqrt(hdim))})
        p["bns"] = [_bn_params(H * hd) for _ in range(L - 1)]
    elif nm in ("sage", "sage1"):
        dims = [F] + [H] * (L - 1) + [C]
        p["lin_l"] = [torch_linear_init(ks[2 * i], dims[i], dims[i + 1])
                      for i in range(L)]
        p["lin_r"] = [torch_linear_init(ks[2 * i + 1], dims[i], dims[i + 1])
                      for i in range(L)]
        p["bns"] = [_bn_params(H) for _ in range(L - 1)]
    elif nm == "gin":
        dims = [F] + [H] * L
        p["mlps"] = []
        for i in range(L):
            p["mlps"].append({
                "l1": torch_linear_init(ks[2 * i], dims[i], H),
                "l2": torch_linear_init(ks[2 * i + 1], H, H),
            })
        p["eps"] = jnp.zeros((L,))
        p["out"] = torch_linear_init(ks[2 * L], H, C)
        p["bns"] = [_bn_params(H) for _ in range(L)]
    elif nm in ("sgc", "sgcmem"):
        p["lin"] = torch_linear_init(ks[0], F, C)
    elif nm == "fagcn":
        p["in"] = torch_linear_init(ks[0], F, H)
        p["att"] = [torch_linear_init(ks[1 + i], 2 * H, 1) for i in range(L)]
        p["out"] = torch_linear_init(ks[1 + L], H, C)
    elif nm == "h2gcn":
        p["embed"] = torch_linear_init(ks[0], F, H)
        # after R rounds the concat is H * (2^{R+1} - 1) wide (Mixhop models.py H2GCN)
        final_dim = H * (2 ** (L + 1) - 1)
        p["out"] = torch_linear_init(ks[1], final_dim, C)
    elif nm == "mixhop":
        hops = spec.k_hops + 1
        dims_in = [F] + [H * hops] * (L - 1)
        p["hop_lins"] = [[torch_linear_init(ks[i * hops + j], dims_in[i], H)
                          for j in range(hops)] for i in range(L)]
        p["bns"] = [_bn_params(H * hops) for _ in range(L)]
        p["out"] = torch_linear_init(ks[15], H * hops, C)
    elif nm == "link":
        # LINK (Mixhop models.py): logistic regression on adjacency rows —
        # logits_i = sum_{j in N(i)} W[j], sparse form of A @ W.
        p["w_nodes"] = uniform_bound(ks[0], (spec.n_nodes, C),
                                     1.0 / math.sqrt(max(spec.n_nodes, 1)))
        p["b"] = jnp.zeros((C,))
    elif nm == "gcnjk":
        dims = [F] + [H] * L
        p["lins"] = [torch_linear_init(ks[i], dims[i], H) for i in range(L)]
        p["bns"] = [_bn_params(H) for _ in range(L)]
        p["out"] = torch_linear_init(ks[L], H * L, C)
    elif nm == "gatjk":
        # GAT stack, all layers H*heads wide (Mixhop models.py:399-427),
        # max-JK over per-layer outputs, final linear
        hd = spec.heads
        p["lins"], p["att"] = [], []
        for i in range(L):
            din = F if i == 0 else H * hd
            p["lins"].append(torch_linear_init(ks[3 * i], din, H * hd))
            p["att"].append({"a_src": uniform_bound(ks[3 * i + 1], (hd, H),
                                                    1.0 / math.sqrt(H)),
                             "a_dst": uniform_bound(ks[3 * i + 2], (hd, H),
                                                    1.0 / math.sqrt(H))})
        p["bns"] = [_bn_params(H * hd) for _ in range(L - 1)]
        p["out"] = torch_linear_init(ks[3 * L], H * hd, C)
    elif nm == "cheb":
        # two ChebConv(K=2) layers (GPRGNN GNN_models_h2gcn.py:139-155):
        # per layer out = W0·x + W1·(L̃ x), L̃ = -Â_sym for λmax = 2
        p["c1"] = [torch_linear_init(ks[0], F, H),
                   torch_linear_init(ks[1], F, H)]
        p["c2"] = [torch_linear_init(ks[2], H, C),
                   torch_linear_init(ks[3], H, C)]
    elif nm == "lp":
        p = {"dummy": jnp.zeros((1,))}   # parameterless label propagation
    elif nm in ("gprgnn", "appnp"):
        p["l1"] = torch_linear_init(ks[0], F, H)
        p["l2"] = torch_linear_init(ks[1], H, C)
        if nm == "gprgnn":
            a = spec.alpha
            K = spec.k_hops * 5   # GPR uses K=10 by default with k_hops=2
            gamma = a * (1 - a) ** np.arange(K + 1)
            gamma[-1] = (1 - a) ** K
            p["gamma"] = jnp.asarray(gamma, jnp.float32)
    else:
        raise ValueError(f"unknown baseline {nm}")
    return p


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _drop(x, rate, train, key):
    if not train or rate <= 0 or key is None:
        return x
    keep = 1.0 - rate
    return jnp.where(jax.random.bernoulli(key, keep, x.shape), x / keep, 0.0)


def _linear(p, x):
    return x @ p["w"] + p["b"]


def init_bn_state(params: dict) -> list:
    """Running-stats state for every BN layer of a baseline (torch init:
    mean 0, var 1), in the order the forward consumes them."""
    return [{"mean": jnp.zeros_like(b["scale"]),
             "var": jnp.ones_like(b["scale"])}
            for b in params.get("bns", [])]


def baseline_forward(params: dict, spec: BaselineSpec, X: jnp.ndarray,
                     graphs: Dict[str, EdgeGraph], train: bool = False,
                     key: Optional[jax.Array] = None) -> jnp.ndarray:
    """Stateless forward: BN uses batch statistics in both modes (golden
    tests / one-shot probes).  Training uses the stateful variant below."""
    logits, _ = baseline_forward_stateful(params, spec, X, graphs, None,
                                          train=train, key=key)
    return logits


def baseline_forward_stateful(params: dict, spec: BaselineSpec,
                              X: jnp.ndarray, graphs: Dict[str, EdgeGraph],
                              bn_state: Optional[list], train: bool = False,
                              key: Optional[jax.Array] = None):
    """Forward with torch BN semantics: returns ``(logits, new_bn_state)``.

    Train mode normalizes with batch stats and advances the running stats;
    eval mode normalizes with the running stats (torch ``BatchNorm1d``) —
    closing the documented deviation where eval used batch statistics.
    """
    bn = BatchNormCtx(bn_state, train)
    cdt = jnp.bfloat16 if spec.compute_dtype == "bfloat16" else None
    if cdt is not None:
        X = X.astype(cdt)
        params = jax.tree_util.tree_map(lambda a: a.astype(cdt), params)
    logits = _forward(params, spec, X, graphs, train, key, bn)
    return logits.astype(jnp.float32), bn.new


def _forward(params: dict, spec: BaselineSpec, X: jnp.ndarray,
             graphs: Dict[str, EdgeGraph], train: bool,
             key: Optional[jax.Array], bn) -> jnp.ndarray:
    nm = spec.name
    keys = iter(jax.random.split(key, 16)) if key is not None else None

    def nk():
        return next(keys) if keys is not None else None

    h = X
    if nm == "mlp":
        for i, lin in enumerate(params["lins"][:-1]):
            h = _linear(lin, h)
            h = bn(h, **params["bns"][i])
            h = jax.nn.relu(h)
            h = _drop(h, spec.dropout, train, nk())
        return _linear(params["lins"][-1], h)

    if nm == "gcn":
        eg = graphs["sym"]
        for i, lin in enumerate(params["lins"][:-1]):
            h = spmm(eg, _linear(lin, h))
            h = bn(h, **params["bns"][i])
            h = jax.nn.relu(h)
            h = _drop(h, spec.dropout, train, nk())
        return spmm(eg, _linear(params["lins"][-1], h))

    if nm == "gat":
        eg = graphs["raw"]
        L = len(params["lins"])
        for i in range(L):
            att = params["att"][i]
            nheads, hdim = att["a_src"].shape
            z = _linear(params["lins"][i], h).reshape(-1, nheads, hdim)
            s_src = jnp.einsum("nhd,hd->nh", z, att["a_src"])
            s_dst = jnp.einsum("nhd,hd->nh", z, att["a_dst"])
            scores = jax.nn.leaky_relu(s_src[eg.src] + s_dst[eg.dst], 0.2)
            alpha = jax.vmap(lambda s: segment_softmax(s, eg.dst, eg.n),
                             in_axes=1, out_axes=1)(scores)
            alpha = _drop(alpha, spec.dropout, train, nk())
            msgs = z[eg.src] * alpha[:, :, None]
            h = jax.ops.segment_sum(msgs, eg.dst, num_segments=eg.n)
            if i < L - 1:
                h = h.reshape(eg.n, nheads * hdim)
                h = bn(h, **params["bns"][i])
                h = jax.nn.elu(h)
                h = _drop(h, spec.dropout, train, nk())
            else:
                h = h.mean(axis=1) if nheads > 1 else h.reshape(eg.n, hdim)
        return h

    if nm in ("sage", "sage1"):
        # sage: PyG SAGEConv lin_l(mean_N(x)) + lin_r(x); sage1: the custom
        # my_SAGEConv (graphsage.py:49-61) means lin_l(x) over N(i)∪{i}
        eg = graphs["mean" if nm == "sage" else "mean_sl"]
        L = len(params["lin_l"])
        for i in range(L):
            agg = spmm(eg, h)                     # mean over neighbors(+self)
            h = _linear(params["lin_l"][i], agg) + _linear(params["lin_r"][i], h)
            if i < L - 1:
                h = bn(h, **params["bns"][i])
                h = jax.nn.relu(h)
                h = _drop(h, spec.dropout, train, nk())
        return h

    if nm == "gin":
        eg = graphs["raw"]
        for i, mlp in enumerate(params["mlps"]):
            agg = spmm(eg, h) + (1.0 + params["eps"][i]) * h
            h = jax.nn.relu(_linear(mlp["l1"], agg))
            h = _linear(mlp["l2"], h)
            h = bn(h, **params["bns"][i])
            h = jax.nn.relu(h)
        h = _drop(h, spec.dropout, train, nk())
        return _linear(params["out"], h)

    if nm == "sgc":
        eg = graphs["sym"]
        for _ in range(spec.k_hops):
            h = spmm(eg, h)
        return _linear(params["lin"], h)

    if nm == "sgcmem":
        # SGCMem (Mixhop models.py:114-160): weight multiplication FIRST
        # (F→C, cheaper when C < F), then hops sym-normalized propagations
        eg = graphs["sym"]
        h = _linear(params["lin"], h)
        for _ in range(spec.k_hops):
            h = spmm(eg, h)
        return h

    if nm == "fagcn":
        raw, egs = graphs["raw"], graphs["symnl"]
        h = _drop(h, spec.dropout, train, nk())
        h = jax.nn.relu(_linear(params["in"], h))
        h = _drop(h, spec.dropout, train, nk())
        h0 = h
        for att in params["att"]:
            cat = jnp.concatenate([h[egs.src], h[egs.dst]], axis=-1)
            alpha = jnp.tanh(_linear(att, cat))[:, 0]
            msgs = h[egs.src] * (alpha * egs.w)[:, None]
            prop = jax.ops.segment_sum(msgs, egs.dst, num_segments=egs.n)
            h = spec.eps * h0 + prop
        return _linear(params["out"], h)

    if nm == "h2gcn":
        h1, h2 = graphs["h1"], graphs["h2"]
        h = jax.nn.relu(_linear(params["embed"], h))
        feats = [h]
        cur = h
        for _ in range(spec.num_layers):
            cur = jnp.concatenate([spmm(h1, cur), spmm(h2, cur)], axis=-1)
            feats.append(cur)
        out = jnp.concatenate(feats, axis=-1)
        out = _drop(out, spec.dropout, train, nk())
        return _linear(params["out"], out)

    if nm == "mixhop":
        eg = graphs["sym"]
        for i, hop_lins in enumerate(params["hop_lins"]):
            outs = []
            z = h
            for j, lin in enumerate(hop_lins):
                outs.append(_linear(lin, z))
                if j < len(hop_lins) - 1:
                    z = spmm(eg, z)
            h = jnp.concatenate(outs, axis=-1)
            h = bn(h, **params["bns"][i])
            h = jax.nn.relu(h)
            h = _drop(h, spec.dropout, train, nk())
        return _linear(params["out"], h)

    if nm == "link":
        eg = graphs["raw"]
        return spmm(eg, params["w_nodes"]) + params["b"]

    if nm == "gcnjk":
        eg = graphs["sym"]
        outs = []
        for i, lin in enumerate(params["lins"]):
            h = spmm(eg, _linear(lin, h))
            h = bn(h, **params["bns"][i])
            h = jax.nn.relu(h)
            h = _drop(h, spec.dropout, train, nk())
            outs.append(h)
        return _linear(params["out"], jnp.concatenate(outs, axis=-1))

    if nm == "gatjk":
        eg = graphs["raw"]
        L = len(params["lins"])
        xs = []
        for i in range(L):
            att = params["att"][i]
            nheads, hdim = att["a_src"].shape
            z = _linear(params["lins"][i], h).reshape(-1, nheads, hdim)
            s_src = jnp.einsum("nhd,hd->nh", z, att["a_src"])
            s_dst = jnp.einsum("nhd,hd->nh", z, att["a_dst"])
            scores = jax.nn.leaky_relu(s_src[eg.src] + s_dst[eg.dst], 0.2)
            alpha = jax.vmap(lambda s: segment_softmax(s, eg.dst, eg.n),
                             in_axes=1, out_axes=1)(scores)
            msgs = z[eg.src] * alpha[:, :, None]
            h = jax.ops.segment_sum(msgs, eg.dst,
                                    num_segments=eg.n).reshape(eg.n, -1)
            if i < L - 1:
                h = bn(h, **params["bns"][i])
                h = jax.nn.elu(h)
                xs.append(h)
                h = _drop(h, spec.dropout, train, nk())
            else:
                xs.append(h)
        # max jumping knowledge (Mixhop models.py:422 jk_type='max')
        jk = jnp.max(jnp.stack(xs, axis=0), axis=0)
        return _linear(params["out"], jk)

    if nm == "cheb":
        # ChebConv K=2, λmax=2 → T0 = x, T1 = L̃x = -Â_sym x
        eg = graphs["symnl"]
        h = _linear(params["c1"][0], h) + _linear(params["c1"][1], -spmm(eg, h))
        h = jax.nn.relu(h)
        h = _drop(h, spec.dropout, train, nk())
        return _linear(params["c2"][0], h) + _linear(params["c2"][1], -spmm(eg, h))

    if nm == "lp":
        # MultiLP (Mixhop models.py:206-258): X must be the one-hot train
        # labels (zeros elsewhere); parameterless α-propagation
        eg = graphs["symnl"]
        y0 = h

        def lp_iter(_, res):
            for _ in range(spec.k_hops):          # k_hops is tiny and static
                res = spmm(eg, res)
            return spec.alpha * res + (1 - spec.alpha) * y0

        # 50 α-iterations as a fori_loop — the Python unroll compiled 100
        # spmm ops into the graph (compile-size wall at scale)
        res = jax.lax.fori_loop(0, 50, lp_iter, y0)
        return res + 0.0 * params["dummy"][0]

    if nm in ("gprgnn", "appnp"):
        eg = graphs["sym"]
        h = _drop(h, spec.dropout, train, nk())
        h = jax.nn.relu(_linear(params["l1"], h))
        h = _drop(h, spec.dropout, train, nk())
        h = _linear(params["l2"], h)
        if nm == "appnp":
            z = h
            for _ in range(10):
                z = (1 - spec.alpha) * spmm(eg, z) + spec.alpha * h
            return z
        gamma = params["gamma"]
        z = gamma[0] * h
        cur = h
        for k in range(1, gamma.shape[0]):
            cur = spmm(eg, cur)
            z = z + gamma[k] * cur
        return z

    raise ValueError(f"unknown baseline {nm}")
