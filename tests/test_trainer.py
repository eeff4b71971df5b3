

"""Round-scan chunking (bounded device executions, trainer.py)."""
import numpy as np


def test_scan_chunk_equals_monolithic(small_graph):
    """Chunked round scan (bounded device executions) == one-shot scan."""
    import dataclasses

    import jax.numpy as jnp

    from pathnet_tpu.config import TrainConfig
    from pathnet_tpu.models import PaggSpec
    from pathnet_tpu.sample import PathSampler
    from pathnet_tpu.train.trainer import run_round

    g = small_graph
    ps = PathSampler.build(g, num_walks=6, walk_len=3)
    spec = PaggSpec(feat_dim=g.features.shape[1], hidden=16, out_dim=3,
                    walk_len=3, variant="hetero", dropout=0.0)
    X = jnp.asarray(g.features)
    y = jnp.asarray(g.labels)
    n = g.n
    masks = (np.arange(n) % 3 == 0, np.arange(n) % 3 == 1, np.arange(n) % 3 == 2)
    base = TrainConfig(epochs=13, lr=1e-2, scan_chunk=None)
    r_mono = run_round(X, y, ps, spec, base, *masks, num_classes=3, seed=5,
                       track_history=True)
    r_chunk = run_round(X, y, ps, spec,
                        dataclasses.replace(base, scan_chunk=5), *masks,
                        num_classes=3, seed=5, track_history=True)
    assert r_mono.best_val_acc == r_chunk.best_val_acc
    np.testing.assert_allclose(r_mono.history, r_chunk.history, atol=0)
    for k, v in r_mono.metrics.items():
        assert v == r_chunk.metrics[k], k
