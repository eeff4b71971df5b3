"""Synthetic datasets and payload stand-ins.

The reference snapshot is missing every feature/label payload
(``splits/``, ``other_data/``: .MISSING_LARGE_BLOBS) — only the edge
structure of cornell/cora/citeseer/Nba is checked in.  This module provides:

- ``attach_synthetic_payload`` — deterministic label/feature stand-ins for a
  real edge structure, so the full pipeline (MERW → sampling → PAGG →
  10-round protocol) runs end-to-end on the true graphs.
- ``synthetic_graph`` — SBM-style generator with a target homophily ratio,
  used to fabricate large-graph stand-ins (pubmed/bgp/Electronics scale) for
  the gen_epoch-mode and multi-chip benchmarks.
- ``path_pattern_labels`` — the synthetic path-pattern experiment of the
  paper (reference: synthetic_data/gen_cora_syn.cpp): each node is labeled
  with its most frequent length-3 path parity-pattern.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from .graph import Graph


def synthetic_features(labels: np.ndarray, feat_dim: int, num_classes: int,
                       signal: float = 3.0, seed: int = 0) -> np.ndarray:
    """Noisy class-conditional features: x ~ centroid[label] + N(0, 1).

    ``signal`` is the expected inter-centroid Mahalanobis distance in noise
    sigmas, *independent of feat_dim* (raw centroid draws in high dims are
    near-orthogonal and make any labeling linearly separable — observed as
    100% accuracy on 1703-dim cornell stand-ins).  signal≈3 gives realistic
    80-95% accuracy bands.
    """
    rng = np.random.default_rng(seed)
    scale = signal / np.sqrt(2.0 * feat_dim)
    centroids = rng.normal(0, scale, size=(num_classes, feat_dim))
    x = rng.normal(0, 1.0, size=(len(labels), feat_dim))
    valid = labels >= 0
    x[valid] += centroids[labels[valid]]
    return x.astype(np.float32)


def synthetic_labels(g: Graph, num_classes: int, homophily: float = 0.5,
                     seed: int = 0, rounds: int = 3) -> np.ndarray:
    """Structure-correlated labels for an existing edge structure.

    Starts from random labels, then runs majority-vote propagation biased by
    ``homophily``: high values converge to smooth (homophilous) labelings,
    low values keep labels near-independent of the graph.
    """
    rng = np.random.default_rng(seed)
    y = rng.integers(0, num_classes, size=g.n)
    if homophily <= 0:
        return y.astype(np.int64)
    adj = g.to_adjacency(binary=True)
    for _ in range(rounds):
        onehot = np.eye(num_classes, dtype=np.float32)[y]
        votes = adj @ onehot
        majority = votes.argmax(axis=1)
        take = rng.random(g.n) < homophily
        y = np.where(take & (votes.max(axis=1) > 0), majority, y)
    return y.astype(np.int64)


def attach_synthetic_payload(g: Graph, num_classes: int = 5, feat_dim: int = 128,
                             homophily: float = 0.5, signal: float = 3.0,
                             seed: int = 0) -> Graph:
    """Attach deterministic synthetic labels + features to a real structure."""
    y = synthetic_labels(g, num_classes, homophily, seed)
    x = synthetic_features(y, feat_dim, num_classes, signal, seed + 1)
    return Graph(n=g.n, src=g.src, dst=g.dst, prob=g.prob,
                 features=x, labels=y, name=g.name or "synthetic")


def synthetic_graph(n: int, avg_deg: float, num_classes: int = 5,
                    homophily: float = 0.5, feat_dim: int = 128,
                    signal: float = 3.0, seed: int = 0) -> Graph:
    """SBM-flavored random graph with a target edge-homophily ratio.

    Draws ``m = n * avg_deg / 2`` undirected edges; each edge is intra-class
    with probability ``homophily`` (endpoints drawn from one class) else
    inter-class.  Self-loops and duplicates are allowed, mirroring the
    reference inputs (cornell.in contains both).
    """
    rng = np.random.default_rng(seed)
    y = rng.integers(0, num_classes, size=n).astype(np.int64)
    m = int(n * avg_deg / 2)
    # bucket nodes by class for intra-class endpoint draws
    by_class = [np.flatnonzero(y == c) for c in range(num_classes)]
    by_class = [b if len(b) else np.arange(n) for b in by_class]
    intra = rng.random(m) < homophily
    u = rng.integers(0, n, size=m)
    v = np.empty(m, dtype=np.int64)
    v_rand = rng.integers(0, n, size=m)
    for c in range(num_classes):
        sel = intra & (y[u] == c)
        v[sel] = rng.choice(by_class[c], size=int(sel.sum()))
    v[~intra] = v_rand[~intra]
    src = np.concatenate([u, v]).astype(np.int32)
    dst = np.concatenate([v, u]).astype(np.int32)
    x = synthetic_features(y, feat_dim, num_classes, signal, seed + 1)
    return Graph(n=n, src=src, dst=dst, prob=np.ones(len(src)),
                 features=x, labels=y, name=f"sbm_n{n}")


def csbm_graph(n: int, d: float, lam: float, mu: float, feat_dim: int,
               seed: int = 0) -> Graph:
    """Contextual SBM generator (reference: GPRGNN/cSBM_dataset.py).

    Two balanced classes y ∈ {±1}; edges drawn with intra-class probability
    ``(d + lam*sqrt(d))/n`` and inter-class ``(d - lam*sqrt(d))/n``;
    features ``x = sqrt(mu/n)·y·u + Z/sqrt(f)`` with a shared random spike
    ``u``.  ``lam`` controls graph signal, ``mu`` feature signal — the
    phase-diagram knobs of the cSBM paper.
    """
    rng = np.random.default_rng(seed)
    y = rng.integers(0, 2, size=n)
    sq = np.sqrt(d)
    p_in = min(1.0, max(0.0, (d + lam * sq) / n))
    p_out = min(1.0, max(0.0, (d - lam * sq) / n))
    # sample edges blockwise via expected counts (sparse Bernoulli approx)
    m_target = int(n * d)
    u = rng.integers(0, n, size=3 * m_target)
    v = rng.integers(0, n, size=3 * m_target)
    same = y[u] == y[v]
    keep = np.where(same, rng.random(len(u)) < p_in * n / d / 3,
                    rng.random(len(u)) < p_out * n / d / 3)
    u, v = u[keep], v[keep]
    src = np.concatenate([u, v]).astype(np.int32)
    dst = np.concatenate([v, u]).astype(np.int32)
    spike = rng.normal(size=feat_dim) / np.sqrt(feat_dim)
    z = rng.normal(size=(n, feat_dim)) / np.sqrt(feat_dim)
    x = (np.sqrt(mu / n) * np.where(y == 1, 1.0, -1.0)[:, None] * spike[None]
         + z).astype(np.float32)
    return Graph(n=n, src=src, dst=dst, prob=np.ones(len(src)), features=x,
                 labels=y.astype(np.int64), name=f"csbm_n{n}")


def path_pattern_labels(g: Graph, walk_len: int = 3, num_patterns: int = 16,
                        ) -> np.ndarray:
    """Paper's synthetic path-pattern labels (gen_cora_syn.cpp semantics).

    For every node, enumerate all simple directed walks of ``walk_len``
    steps, map each walk to the bitmask of parity features (node_index & 1)
    along it, and label the node with the most frequent bitmask.  Implemented
    as an iterative frontier product instead of recursion; counts include
    revisits exactly like the reference DFS (which does not mark visited).
    """
    adj = [g.dst[g.src == u] for u in range(g.n)]
    labels = np.zeros(g.n, np.int64)
    for s in range(g.n):
        counts = np.zeros(num_patterns, np.int64)
        # stack of (node, depth, mask): DFS over all walks, no visited set
        stack = [(s, 0, s & 1)]
        while stack:
            u, depth, mask = stack.pop()
            if depth == walk_len:
                counts[mask % num_patterns] += 1
                continue
            for w in adj[u]:
                stack.append((int(w), depth + 1, (mask << 1) | (int(w) & 1)))
        labels[s] = counts.argmax()
    return labels
