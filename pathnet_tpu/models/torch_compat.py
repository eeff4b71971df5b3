"""Torch checkpoint interop.

The reference saves ``state_dict`` checkpoints (PathNet_run.py:373-374;
one artifact ships with the repo: saved_models/cornell.pth).  This module
maps them onto our parameter pytree so reference-trained models run under
this framework (and vice versa for golden tests).

Key mapping (torch → ours; torch Linear stores [out, in], we store [in, out]):

| torch                         | ours                 |
|-------------------------------|----------------------|
| fc0.weight / fc0.bias         | fc0.w (T) / fc0.b    |
| nets.<k>.weight / .bias       | dist.w[k] (T) / dist.b[k] |
| LSTM.weight_ih_l0 / _hh_l0    | rnn.w_ih (T) / w_hh (T)   |
| LSTM.bias_ih_l0 / _hh_l0      | rnn.b_ih / b_hh      |
| attw.weight / .bias           | attw.w (T) / attw.b  |
| fc2.weight / .bias            | fc2.w (T) / fc2.b    |
"""
from __future__ import annotations

from typing import Dict

import numpy as np

import jax.numpy as jnp

from .pagg import PaggSpec


def params_from_state_dict(sd: Dict[str, "object"], spec: PaggSpec) -> dict:
    """Build our param pytree from a torch ``state_dict``-like mapping of
    name → array (tensors or numpy arrays accepted)."""

    def arr(name):
        v = sd[name]
        v = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
        return jnp.asarray(v, jnp.float32)

    wl = spec.walk_len
    params = {
        "fc0": {"w": arr("fc0.weight").T, "b": arr("fc0.bias")},
        "fc2": {"w": arr("fc2.weight").T, "b": arr("fc2.bias")},
        "dist": {
            "w": jnp.stack([arr(f"nets.{k}.weight").T for k in range(wl)]),
            "b": jnp.stack([arr(f"nets.{k}.bias") for k in range(wl)]),
        },
        "attw": {"w": arr("attw.weight").T, "b": arr("attw.bias")},
    }
    if spec.rnn == "lstm":
        params["rnn"] = {
            "w_ih": arr("LSTM.weight_ih_l0").T,
            "w_hh": arr("LSTM.weight_hh_l0").T,
            "b_ih": arr("LSTM.bias_ih_l0"),
            "b_hh": arr("LSTM.bias_hh_l0"),
        }
    elif spec.rnn == "gru":
        params["rnn"] = {
            "w_ih": arr("GRU.weight_ih_l0").T,
            "w_hh": arr("GRU.weight_hh_l0").T,
            "b_ih": arr("GRU.bias_ih_l0"),
            "b_hh": arr("GRU.bias_hh_l0"),
        }
    else:
        raise ValueError("torch import supports lstm/gru encoders")
    return params


def state_dict_from_params(params: dict, spec: PaggSpec) -> Dict[str, np.ndarray]:
    """Inverse mapping: our pytree → a torch-loadable state_dict of numpy
    arrays (caller wraps in torch tensors)."""
    out = {
        "fc0.weight": np.asarray(params["fc0"]["w"]).T,
        "fc0.bias": np.asarray(params["fc0"]["b"]),
        "fc2.weight": np.asarray(params["fc2"]["w"]).T,
        "fc2.bias": np.asarray(params["fc2"]["b"]),
        "attw.weight": np.asarray(params["attw"]["w"]).T,
        "attw.bias": np.asarray(params["attw"]["b"]),
    }
    for k in range(spec.walk_len):
        out[f"nets.{k}.weight"] = np.asarray(params["dist"]["w"][k]).T
        out[f"nets.{k}.bias"] = np.asarray(params["dist"]["b"][k])
    if spec.rnn == "lstm":
        out["LSTM.weight_ih_l0"] = np.asarray(params["rnn"]["w_ih"]).T
        out["LSTM.weight_hh_l0"] = np.asarray(params["rnn"]["w_hh"]).T
        out["LSTM.bias_ih_l0"] = np.asarray(params["rnn"]["b_ih"])
        out["LSTM.bias_hh_l0"] = np.asarray(params["rnn"]["b_hh"])
    return out
