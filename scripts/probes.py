"""Shared accuracy probes for stand-in payload calibration.

Why not plain ridge (the r3 probes): under heavy label noise a one-vs-all
ridge plateaus far below the Bayes rule (film: ridge 0.245 vs trained MLP
0.37), and sketching wide payloads to 1024 dims biases ridge low by ~10 pts
(citeseer: sketch 0.717 vs full 0.833 — measured r4).  Both artifacts fed
mis-calibrated `signal` values into the registry.

The probes here reduce features to their *sufficient statistics* first —
per-class centroid scores ``x·c_k − ‖c_k‖²/2`` (exact for the isotropic
Gaussian payload) — then train a small multinomial logistic regression by
full-batch gradient descent on those C dims (optionally concatenated with
1/2-hop neighbor class mixes for the structure oracle).  CE training is
label-noise-robust, the probe cost is O(n·d) once + O(n·C²) per GD step at
any feature width, and on datasets with a trained-MLP row the probe matches
it to ~1 pt (citeseer 83.3 vs trained 82.3; film 0.37 band).
"""
from __future__ import annotations

import numpy as np


def centroid_scores(X: np.ndarray, y: np.ndarray, train: np.ndarray,
                    num_classes: int) -> np.ndarray:
    """[n, C] Gaussian sufficient statistics: x·c_k − ‖c_k‖²/2 with
    centroids estimated on the train rows."""
    Xtr, ytr = X[train], y[train]
    cent = np.stack([Xtr[ytr == c].mean(0) if (ytr == c).any()
                     else Xtr.mean(0) for c in range(num_classes)])
    s = X @ cent.T - 0.5 * (cent * cent).sum(1)[None, :]
    # normalize scale so the logistic GD step size is payload-independent
    sd = s.std()
    return (s / max(sd, 1e-9)).astype(np.float32)


def logistic_probe(F: np.ndarray, y: np.ndarray, train: np.ndarray,
                   val: np.ndarray, test: np.ndarray, num_classes: int,
                   steps: int = 600, lr: float = 0.5,
                   weight_decay: float = 1e-4) -> float:
    """Multinomial logistic regression on feature matrix ``F`` (already
    reduced to a few dims).  Columns are standardized first (heterogeneous
    blocks — centroid scores vs class mixes — otherwise condition the GD so
    badly that the joint probe lands *below* its own sub-blocks; measured on
    citeseer: joint 0.672 vs mixes-only 0.752).  Full-batch GD with
    momentum; returns test accuracy at the best-validation step (the
    protocol's model selection)."""
    F = np.asarray(F, np.float64)
    mu = F[train].mean(0, keepdims=True)
    sd = F[train].std(0, keepdims=True)
    F = (F - mu) / np.maximum(sd, 1e-6)
    n, d = F.shape
    Ftr, ytr = F[train], y[train]
    Fva = F[val]
    W = np.zeros((d, num_classes))
    b = np.zeros(num_classes)
    mW = np.zeros_like(W)
    mb = np.zeros_like(b)
    onehot = np.eye(num_classes)[ytr]
    best_val, best = -1.0, (W, b)
    for t in range(steps):
        z = Ftr @ W + b
        z -= z.max(1, keepdims=True)
        p = np.exp(z)
        p /= p.sum(1, keepdims=True)
        g = (p - onehot) / len(ytr)
        gW = Ftr.T @ g + weight_decay * W
        gb = g.sum(0)
        mW = 0.9 * mW + gW
        mb = 0.9 * mb + gb
        W -= lr * mW
        b -= lr * mb
        if t % 5 == 0 or t == steps - 1:
            va = float(((Fva @ W + b).argmax(1) == y[val]).mean())
            if va > best_val:
                best_val, best = va, (W.copy(), b.copy())
    W, b = best
    return float(((F[test] @ W + b).argmax(1) == y[test]).mean())


def neighbor_mixes(src: np.ndarray, dst: np.ndarray, n: int, y: np.ndarray,
                   num_classes: int):
    """(n1, n2): 1-hop and 2-hop neighbor class-mix matrices [n, C] of the
    given labels over the symmetrized self-loop-free adjacency."""
    import scipy.sparse as sp
    A = sp.coo_matrix((np.ones(len(src)), (src, dst)), shape=(n, n)).tocsr()
    A = ((A + A.T) > 0).astype(np.float32)
    A.setdiag(0)
    A.eliminate_zeros()
    eye = np.eye(num_classes, dtype=np.float32)
    c1 = A @ eye[y]
    A2 = A @ A
    A2.setdiag(0)
    c2 = A2 @ eye[y]
    n1 = c1 / np.maximum(c1.sum(1, keepdims=True), 1)
    n2 = c2 / np.maximum(c2.sum(1, keepdims=True), 1)
    return n1, n2


def feat_probe(X, y, train, val, test, num_classes) -> float:
    """MLP proxy: logistic regression on the C centroid scores."""
    s = centroid_scores(X, y, train, num_classes)
    return logistic_probe(s, y, train, val, test, num_classes)


def oracle_probe(X, y, train, val, test, num_classes, n1, n2=None) -> float:
    """Structure-information upper proxy: logistic on
    [centroid scores ‖ 1-hop mix (‖ 2-hop mix)]."""
    s = centroid_scores(X, y, train, num_classes)
    blocks = [s, n1.astype(np.float32) * 3.0]
    if n2 is not None:
        blocks.append(n2.astype(np.float32) * 3.0)
    return logistic_probe(np.hstack(blocks), y, train, val, test, num_classes)


def sample_walk_pattern_hist(src: np.ndarray, dst: np.ndarray, n: int,
                             bits: np.ndarray, num_walks: int = 40,
                             steps: int = 3, seed: int = 0,
                             kind: str = "xor", prob=None) -> np.ndarray:
    """[n, 2^steps] empirical distribution of the bit patterns of
    ``num_walks`` uniform random walks per node — what a sampled-path model
    can reconstruct of the planted walk-pattern channel
    (synthetic.walk_pattern_dist).  Mirrors the plug-in decoder of
    scripts/pattern_ceiling.py on the symmetrized adjacency."""
    import scipy.sparse as sp
    if prob is None:
        A = sp.coo_matrix((np.ones(len(src)), (src, dst)),
                          shape=(n, n)).tocsr()
        A = ((A + A.T) > 0)
        A.setdiag(0)
        A = A.tocsr()
        indptr, indices = A.indptr, A.indices
        cum = None
    else:
        # walk the actual weighted directed measure (self-loops included) —
        # must mirror synthetic._walk_operator
        P = sp.coo_matrix((prob.astype(np.float64), (src, dst)),
                          shape=(n, n)).tocsr()
        P.sum_duplicates()
        indptr, indices = P.indptr, P.indices
        cum = np.zeros(len(P.data))
        for i in range(n):
            seg = P.data[indptr[i]:indptr[i + 1]]
            if len(seg):
                cum[indptr[i]:indptr[i + 1]] = np.cumsum(seg)
    rng = np.random.default_rng(seed)
    cur = np.repeat(np.arange(n), num_walks)
    pat = np.zeros(n * num_walks, np.int64)
    alive = np.ones(n * num_walks, bool)
    prev_bit = bits[cur].astype(np.int64)
    for _ in range(steps):
        deg = indptr[cur + 1] - indptr[cur]
        alive &= deg > 0
        if cum is None:
            off = (rng.random(len(cur)) * np.maximum(deg, 1)).astype(np.int64)
        else:
            lo, hi = indptr[cur], indptr[cur + 1]
            tot = np.where(deg > 0, cum[np.maximum(hi - 1, 0)], 1.0)
            targets = rng.random(len(cur)) * tot
            # vectorized per-row searchsorted over the flat cumsum
            off = np.empty(len(cur), np.int64)
            for i in range(len(cur)):
                off[i] = np.searchsorted(cum[lo[i]:hi[i]], targets[i])                     if hi[i] > lo[i] else 0
            off = np.minimum(off, np.maximum(deg - 1, 0))
        nxt = np.where(deg > 0,
                       indices[np.minimum(indptr[cur] + off,
                                          max(len(indices) - 1, 0))], cur)
        nxt_bit = bits[nxt].astype(np.int64)
        # pattern alphabet mirrors synthetic.walk_pattern_dist: raw visited
        # bits, or XOR of consecutive bits along the walk
        sym = nxt_bit if kind == "raw" else (prev_bit ^ nxt_bit)
        pat = (pat << 1) | np.where(alive, sym, 0)
        prev_bit = nxt_bit
        cur = nxt
    npat = 1 << steps
    hist = np.zeros((n, npat), np.float32)
    np.add.at(hist, (np.repeat(np.arange(n), num_walks), pat),
              alive.astype(np.float32))
    return hist / max(num_walks, 1)


def decoder_features(hist: np.ndarray, mark: np.ndarray,
                     steps: int = 3) -> np.ndarray:
    """[n, M] gated plug-in decoder block for the planted pattern channel:
    for each *marked* node, the one-hot of its dominant *mixed* pattern
    scaled by the empirical margin (top1−top2 of the mixed bins).

    A flat-histogram feature alone cannot express the channel to a LINEAR
    probe — the pattern label applies only to the S nodes, and ungated
    histogram scores hurt on the non-S majority (measured: Dblp headroom
    ~0 ungated).  The S-mark is feature-visible by construction
    (synthetic.apply_pattern_channel), so the gate mirrors what any model
    can compute; only the *order decoding* inside the gate is path-
    exclusive."""
    from pathnet_tpu.data.synthetic import mixed_patterns
    mixed = mixed_patterns(steps)
    hm = hist[:, mixed]
    srt = np.sort(hm, axis=1)
    margin = srt[:, -1] - srt[:, -2]
    G = np.zeros_like(hm)
    G[np.arange(len(hm)), hm.argmax(axis=1)] = (0.1 + margin) * (mark > 0)
    return G


def path_oracle_probe(X, y, train, val, test, num_classes, n1, n2,
                      hist) -> float:
    """Path-information upper proxy: the mix oracle plus the sampled-walk
    pattern histogram and its gated plug-in decoder block
    (:func:`decoder_features`; the S-mark is read from the payload's
    second-to-last feature column).  The probe learns the pattern→class map
    from data (C×6 weights), as a trained path model would — this probe
    minus :func:`oracle_probe` is the decodable path-only headroom the
    trained PathNet competes for."""
    s = centroid_scores(X, y, train, num_classes)
    F = np.hstack([s, n1.astype(np.float32) * 3.0,
                   n2.astype(np.float32) * 3.0,
                   hist.astype(np.float32) * 3.0,
                   decoder_features(hist, np.asarray(X)[:, -2]) * 10.0])
    return logistic_probe(F, y, train, val, test, num_classes)
