import os

import numpy as np
import jax
import jax.numpy as jnp
import torch

from pathnet_tpu.models import PaggSpec, init_pagg_params, pagg_forward
from pathnet_tpu.models.torch_compat import (params_from_state_dict,
                                             state_dict_from_params)

CKPT = os.path.join(os.path.dirname(__file__), "..", "data",
                    "reference_checkpoints", "cornell.pth")


def test_load_reference_cornell_checkpoint():
    """The reference's shipped cornell checkpoint (hid=128, F=1703, C=5,
    wl=4 — saved by PathNet_run.py:373) loads into our pytree and runs."""
    sd = torch.load(CKPT, map_location="cpu")
    spec = PaggSpec(feat_dim=1703, hidden=128, out_dim=5, walk_len=4,
                    variant="hetero", quirk_compat=True)
    params = params_from_state_dict(sd, spec)
    assert params["fc0"]["w"].shape == (1703, 128)
    assert params["dist"]["w"].shape == (4, 128, 128)
    assert params["rnn"]["w_ih"].shape == (128, 512)

    rng = np.random.default_rng(0)
    T, nw, wl = 11, 6, 4
    X = jnp.asarray(rng.normal(size=(50, 1703)).astype(np.float32))
    paths = rng.integers(0, 50, size=(T, nw, wl)).astype(np.int32)
    paths[:, :, 0] = np.arange(T)[:, None]
    dists = np.minimum(rng.integers(0, wl, size=(T, nw, wl)),
                       np.arange(wl)).astype(np.int32)
    out = pagg_forward(params, X, jnp.asarray(paths), jnp.asarray(dists),
                       jnp.arange(T), spec, train=False)
    assert out.shape == (T, 5)
    assert np.isfinite(np.asarray(out)).all()


def test_state_dict_roundtrip():
    spec = PaggSpec(feat_dim=9, hidden=8, out_dim=3, walk_len=4)
    params = init_pagg_params(jax.random.PRNGKey(0), spec)
    sd = state_dict_from_params(params, spec)
    back = params_from_state_dict(sd, spec)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(back)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
