"""Recurrent cells with torch gate semantics, driven by ``lax.scan``.

The reference's path encoder is a single-layer ``nn.LSTM`` over
``walk_len ∈ {2..5}`` steps (PathNet_run.py:164,195).  On TPU the natural
form is a scan of fused gate matmuls: per step one ``[B, H] @ [H, 4H]``
MXU matmul (the input projection for *all* steps is hoisted into a single
``[L*B, H] @ [H, 4H]`` matmul before the scan — sequence length is tiny, so
the scan carries only the recurrent matmul).

Gate orders match torch exactly (LSTM: i,f,g,o; GRU: r,z,n — including
GRU's ``r * (h @ W_hn + b_hn)`` placement), so torch checkpoints can be
loaded for golden tests.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def lstm_scan(params: Dict[str, jnp.ndarray], xs: jnp.ndarray
              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run an LSTM over ``xs [L, B, input]``; returns (outputs [L, B, H], h_n [B, H]).

    Zero initial state, matching torch's default.
    """
    H = params["w_hh"].shape[0]
    B = xs.shape[1]
    # hoist input projections out of the scan: one big MXU matmul
    gx = xs.reshape(-1, xs.shape[-1]) @ params["w_ih"] + params["b_ih"]
    gx = gx.reshape(xs.shape[0], B, 4 * H)

    def step(carry, gx_t):
        h, c = carry
        gates = gx_t + h @ params["w_hh"] + params["b_hh"]
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        g = jnp.tanh(g)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c), h

    init = (jnp.zeros((B, H), xs.dtype), jnp.zeros((B, H), xs.dtype))
    (h_n, _), ys = jax.lax.scan(step, init, gx)
    return ys, h_n


def gru_scan(params: Dict[str, jnp.ndarray], xs: jnp.ndarray
             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run a GRU over ``xs [L, B, input]``; returns (outputs, h_n)."""
    H = params["w_hh"].shape[0]
    B = xs.shape[1]
    gx = xs.reshape(-1, xs.shape[-1]) @ params["w_ih"] + params["b_ih"]
    gx = gx.reshape(xs.shape[0], B, 3 * H)

    def step(h, gx_t):
        gh = h @ params["w_hh"] + params["b_hh"]
        xr, xz, xn = jnp.split(gx_t, 3, axis=-1)
        hr, hz, hn = jnp.split(gh, 3, axis=-1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        h = (1.0 - z) * n + z * h
        return h, h

    h_n, ys = jax.lax.scan(step, jnp.zeros((B, H), xs.dtype), gx)
    return ys, h_n
