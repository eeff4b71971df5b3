"""Parameter initializers with torch-default semantics.

Matching initial distributions matters for reproducing the reference's
training dynamics (SURVEY.md §7.3.6): torch ``nn.Linear`` draws weight and
bias from U(-1/sqrt(fan_in), 1/sqrt(fan_in)) (kaiming_uniform with a=sqrt5
reduces to exactly that bound); ``nn.LSTM`` draws every tensor from
U(-1/sqrt(hidden), 1/sqrt(hidden)); the homo PathNet overrides fc0/fc2
weights with xavier_uniform (PathNet_run.py:236-237).

Weights here are stored in ``[in, out]`` layout (for ``x @ w``), the
transpose of torch's ``[out, in]``.
"""
from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp


def uniform_bound(key: jax.Array, shape, bound: float, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def torch_linear_init(key: jax.Array, fan_in: int, fan_out: int,
                      dtype=jnp.float32) -> Dict[str, jnp.ndarray]:
    """torch nn.Linear default: U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for w and b."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(fan_in)
    return {"w": uniform_bound(kw, (fan_in, fan_out), bound, dtype),
            "b": uniform_bound(kb, (fan_out,), bound, dtype)}


def xavier_uniform(key: jax.Array, fan_in: int, fan_out: int,
                   dtype=jnp.float32) -> jnp.ndarray:
    bound = math.sqrt(6.0 / (fan_in + fan_out))
    return uniform_bound(key, (fan_in, fan_out), bound, dtype)


def torch_lstm_init(key: jax.Array, input_size: int, hidden: int,
                    dtype=jnp.float32) -> Dict[str, jnp.ndarray]:
    """torch nn.LSTM default: every tensor U(-1/sqrt(H), 1/sqrt(H)).

    Gate layout along the 4H axis is torch order [i, f, g, o].
    Stored transposed: w_ih [input, 4H], w_hh [H, 4H].
    """
    k1, k2, k3, k4 = jax.random.split(key, 4)
    bound = 1.0 / math.sqrt(hidden)
    return {
        "w_ih": uniform_bound(k1, (input_size, 4 * hidden), bound, dtype),
        "w_hh": uniform_bound(k2, (hidden, 4 * hidden), bound, dtype),
        "b_ih": uniform_bound(k3, (4 * hidden,), bound, dtype),
        "b_hh": uniform_bound(k4, (4 * hidden,), bound, dtype),
    }


def torch_gru_init(key: jax.Array, input_size: int, hidden: int,
                   dtype=jnp.float32) -> Dict[str, jnp.ndarray]:
    """torch nn.GRU default; gate layout [r, z, n] along the 3H axis."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    bound = 1.0 / math.sqrt(hidden)
    return {
        "w_ih": uniform_bound(k1, (input_size, 3 * hidden), bound, dtype),
        "w_hh": uniform_bound(k2, (hidden, 3 * hidden), bound, dtype),
        "b_ih": uniform_bound(k3, (3 * hidden,), bound, dtype),
        "b_hh": uniform_bound(k4, (3 * hidden,), bound, dtype),
    }
