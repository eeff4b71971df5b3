import os

import numpy as np
import jax
import jax.numpy as jnp

from pathnet_tpu.config import TrainConfig
from pathnet_tpu.data import ratio_masks
from pathnet_tpu.models import PaggSpec
from pathnet_tpu.sample import PathSampler
from pathnet_tpu.train import evaluate, predict, run_round
from pathnet_tpu.train.checkpoint import (completed_rounds, load_round,
                                          save_round)


def _train_quick(small_graph, epochs=80, keep_params=True):
    g = small_graph
    ps = PathSampler.build(g, num_walks=8, walk_len=3)
    spec = PaggSpec(feat_dim=g.features.shape[1], hidden=16, out_dim=3,
                    walk_len=3, variant="hetero", dropout=0.3)
    cfg = TrainConfig(lr=0.01, weight_decay=5e-4, epochs=epochs)
    tr, va, te = ratio_masks(g.n, seed=0)
    res = run_round(jnp.asarray(g.features), jnp.asarray(g.labels), ps, spec,
                    cfg, tr, va, te, num_classes=3, seed=0,
                    keep_params=keep_params)
    return g, ps, spec, res, (tr, va, te)


def test_predict_evaluate_roundtrip(small_graph):
    g, ps, spec, res, (tr, va, te) = _train_quick(small_graph)
    X = jnp.asarray(g.features)
    y = jnp.asarray(g.labels)
    logp = predict(res.best_params, X, ps, spec, jax.random.PRNGKey(0))
    assert logp.shape == (g.n, 3)
    np.testing.assert_allclose(np.exp(np.asarray(logp)).sum(1), 1.0, atol=1e-4)
    m = evaluate(res.best_params, X, y, ps, spec, jax.random.PRNGKey(1), te, 3)
    assert m["accuracy"] > 0.4
    # ensembling over path draws is at least not catastrophically different
    m3 = evaluate(res.best_params, X, y, ps, spec, jax.random.PRNGKey(1), te,
                  3, num_ensemble=3)
    assert abs(m3["accuracy"] - m["accuracy"]) < 0.5


def test_checkpoint_save_load_resume(small_graph, tmp_path):
    g, ps, spec, res, _ = _train_quick(small_graph, epochs=30)
    d = str(tmp_path / "ckpts")
    save_round(d, "toy", 0, res)
    assert completed_rounds(d, "toy") == 1
    loaded = load_round(d, "toy", 0)
    assert loaded["meta"]["metrics"]["accuracy"] == res.metrics["accuracy"]
    # params round-trip
    for a, b in zip(jax.tree_util.tree_leaves(loaded["params"]),
                    jax.tree_util.tree_leaves(res.best_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    assert load_round(d, "toy", 1) is None


def test_csbm_generator():
    from pathnet_tpu.data.synthetic import csbm_graph
    g = csbm_graph(n=400, d=5.0, lam=1.5, mu=1.0, feat_dim=32, seed=0)
    assert g.n == 400
    assert set(np.unique(g.labels)) <= {0, 1}
    from pathnet_tpu.data.homophily import edge_homophily
    # lam > 0 → assortative graph
    assert edge_homophily(g, g.labels) > 0.5
    assert np.isfinite(g.features).all()


def test_geomgcn_loader(tmp_path):
    from pathnet_tpu.data.formats import load_geomgcn
    edges = tmp_path / "out1_graph_edges.txt"
    feats = tmp_path / "out1_node_feature_label.txt"
    edges.write_text("src dst\n0 1\n1 2\n2 0\n")
    feats.write_text("id\tfeat\tlabel\n0\t1.0,0.0\t0\n1\t0.5,0.5\t1\n2\t0.0,1.0\t1\n")
    adj, x, y = load_geomgcn(str(edges), str(feats))
    assert adj.shape == (3, 3)
    assert adj[0, 1] == 1 and adj[1, 0] == 1
    np.testing.assert_allclose(x[1], [0.5, 0.5])
    np.testing.assert_array_equal(y, [0, 1, 1])


def test_sharded_predict_matches_plain(small_graph):
    """Serving with graph-partitioned X + sparse exchange == plain predict
    (same key -> same walks -> identical log-probs)."""
    import jax.numpy as jnp
    from pathnet_tpu.models import PaggSpec, init_pagg_params
    from pathnet_tpu.parallel import make_mesh
    from pathnet_tpu.sample import PathSampler
    from pathnet_tpu.train import make_sharded_predict, predict

    g = small_graph
    ps = PathSampler.build(g, num_walks=6, walk_len=3)
    spec = PaggSpec(feat_dim=g.features.shape[1], hidden=16, out_dim=3,
                    walk_len=3, variant="hetero", dropout=0.0)
    params = init_pagg_params(jax.random.PRNGKey(0), spec)
    X = jnp.asarray(g.features)
    idx = jnp.asarray([3, 1, 4, 1, 5, 9, 2, 6], jnp.int32)
    key = jax.random.PRNGKey(7)

    plain = predict(params, X, ps, spec, key, idx)
    fn = make_sharded_predict(make_mesh(n_devices=4), spec)
    sharded = fn(params, X, ps, key, idx)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(plain),
                               atol=1e-5)
