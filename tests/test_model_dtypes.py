"""bfloat16 encode pipeline: close to f32, still trains."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from pathnet_tpu.models import PaggSpec, init_pagg_params, pagg_forward
from pathnet_tpu.sample import PathSampler


def test_bf16_forward_close_to_f32(small_graph):
    g = small_graph
    ps = PathSampler.build(g, num_walks=8, walk_len=3)
    paths, dists = ps.sample(jax.random.PRNGKey(0))
    X = jnp.asarray(g.features)
    idx = jnp.arange(g.n, dtype=jnp.int32)
    for variant in ("hetero", "homo"):
        spec = PaggSpec(feat_dim=X.shape[1], hidden=32, out_dim=3, walk_len=3,
                        variant=variant, dropout=0.0)
        params = init_pagg_params(jax.random.PRNGKey(1), spec)
        lo32 = pagg_forward(params, X, paths, dists, idx, spec)
        lo16 = pagg_forward(params, X, paths, dists, idx,
                            dataclasses.replace(spec,
                                                compute_dtype="bfloat16"))
        assert lo16.dtype == jnp.float32            # head stays f32
        # bf16 has ~3 decimal digits; logits are O(1)
        np.testing.assert_allclose(np.asarray(lo16), np.asarray(lo32),
                                   atol=0.15, rtol=0.1)


def test_bf16_trains(small_graph):
    from pathnet_tpu.config import TrainConfig
    from pathnet_tpu.train.trainer import run_round

    g = small_graph
    ps = PathSampler.build(g, num_walks=8, walk_len=3)
    spec = PaggSpec(feat_dim=g.features.shape[1], hidden=16, out_dim=3,
                    walk_len=3, variant="hetero", dropout=0.0,
                    compute_dtype="bfloat16")
    X = jnp.asarray(g.features)
    y = jnp.asarray(g.labels)
    n = g.n
    masks = (np.arange(n) % 3 == 0, np.arange(n) % 3 == 1,
             np.arange(n) % 3 == 2)
    res = run_round(X, y, ps, spec, TrainConfig(epochs=30, lr=1e-2), *masks,
                    num_classes=3, seed=0)
    assert res.best_val_acc > 0.4       # well above 1/3 chance
