"""MERW companion utilities (reference: preprocess/compute_merw.py:170-270).

These are unused by the PathNet pipeline upstream but part of the module's
surface: generic-random-walk transitions, MERW/basic SimRank, and the
P-distance resolvent.  Implemented dense over jnp for small graphs (their
reference counterparts are O(n^2)–O(n^3) scipy loops).
"""
from __future__ import annotations

from typing import Tuple

import numpy as np

import jax.numpy as jnp

from ..data.graph import Graph


def compute_grw(g: Graph) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Generic (degree-normalized) random walk: P = D^-1 A and its
    stationary distribution deg/sum(deg) (compute_merw.py:170-176)."""
    a = jnp.asarray(g.to_adjacency(binary=True).todense(), jnp.float32)
    deg = a.sum(axis=1)
    p = a / jnp.maximum(deg[:, None], 1.0)
    pi = deg / jnp.maximum(deg.sum(), 1.0)
    return p, pi


def merw_simrank(g: Graph, alpha: float = 0.8, iters: int = 20
                 ) -> jnp.ndarray:
    """MERW-SimRank fixed point (compute_merw.py:179-202 semantics):

    S = alpha/lambda^2 * D(psi) A D(psi)^-1 S D(psi)^-1 A D(psi) with unit
    diagonal, iterated from identity.
    """
    from .merw import principal_eigenpair

    a = jnp.asarray(g.to_adjacency(binary=True).todense(), jnp.float32)
    psi, lam = principal_eigenpair(g)
    psi = jnp.maximum(jnp.asarray(psi), 1e-12)
    # W[u,v] = A[u,v] psi_v / (lambda psi_u)  (the MERW transition matrix)
    w = a * psi[None, :] / (float(lam) * psi[:, None])
    s = jnp.eye(g.n)
    for _ in range(iters):
        s = alpha * (w @ s @ w.T)
        s = s.at[jnp.arange(g.n), jnp.arange(g.n)].set(1.0)
    return s


def basic_simrank(g: Graph, alpha: float = 0.8, iters: int = 20
                  ) -> jnp.ndarray:
    """Plain SimRank (compute_merw.py:205-224 semantics) via the matrix
    form S = alpha * Pn S Pn^T with unit diagonal, Pn = row-normalized A."""
    a = jnp.asarray(g.to_adjacency(binary=True).todense(), jnp.float32)
    deg = jnp.maximum(a.sum(axis=1, keepdims=True), 1.0)
    pn = a / deg
    s = jnp.eye(g.n)
    for _ in range(iters):
        s = alpha * (pn @ s @ pn.T)
        s = s.at[jnp.arange(g.n), jnp.arange(g.n)].set(1.0)
    return s


def p_distance(p: jnp.ndarray, alpha: float = 0.8) -> jnp.ndarray:
    """Resolvent (I - alpha P)^-1 (compute_merw.py:267-270)."""
    n = p.shape[0]
    return jnp.linalg.inv(jnp.eye(n) - alpha * p)
