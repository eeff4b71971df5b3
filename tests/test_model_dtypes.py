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


def test_gather_mode_x_matches_h(small_graph):
    """gather_mode='x' (scatter-free VJP) == 'h' (reference order): same
    forward and same parameter gradients."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from pathnet_tpu.models.pagg import (PaggSpec, init_pagg_params,
                                         pagg_forward)
    from pathnet_tpu.sample import PathSampler

    g = small_graph
    for variant in ("hetero", "homo"):
        spec_h = PaggSpec(feat_dim=g.features.shape[1], hidden=16, out_dim=3,
                          walk_len=4, variant=variant, dropout=0.0,
                          gather_mode="h")
        spec_x = dataclasses.replace(spec_h, gather_mode="x")
        ps = PathSampler.build(g, num_walks=6, walk_len=4)
        paths, dists = ps.sample(jax.random.PRNGKey(0))
        X = jnp.asarray(g.features)
        y = jnp.asarray(g.labels)
        idx = jnp.arange(g.n, dtype=jnp.int32)
        params = init_pagg_params(jax.random.PRNGKey(1), spec_h)

        def loss(p, sp):
            logits = pagg_forward(p, X, paths, dists, idx, sp, train=False)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean()

        lh, gh = jax.value_and_grad(loss)(params, spec_h)
        lx, gx = jax.value_and_grad(loss)(params, spec_x)
        np.testing.assert_allclose(float(lh), float(lx), rtol=1e-5)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-4), gh, gx)
