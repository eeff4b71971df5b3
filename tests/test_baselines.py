import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pathnet_tpu.config import TrainConfig
from pathnet_tpu.data import ratio_masks
from pathnet_tpu.models.baselines import BASELINES, EXTRA_MODELS
from pathnet_tpu.models.baselines.zoo import (BaselineSpec, baseline_forward,
                                              build_baseline_graphs,
                                              init_baseline)
from pathnet_tpu.train.baseline_trainer import run_baseline_round


@pytest.mark.parametrize("name", BASELINES + EXTRA_MODELS)
def test_baseline_forward_finite(name, small_graph):
    g = small_graph
    spec = BaselineSpec(name=name, feat_dim=g.features.shape[1], hidden=8,
                        out_dim=3, heads=2, n_nodes=g.n)
    params = init_baseline(jax.random.PRNGKey(0), spec)
    graphs = build_baseline_graphs(g, name)
    X = jnp.asarray(g.features)
    if name == "lp":
        # MultiLP propagates masked one-hot labels, not features
        X = jnp.eye(3, dtype=jnp.float32)[jnp.asarray(g.labels)]
    out = baseline_forward(params, spec, X, graphs, train=False)
    assert out.shape == (g.n, 3)
    assert np.isfinite(np.asarray(out)).all()
    out_t = baseline_forward(params, spec, X, graphs,
                             train=True, key=jax.random.PRNGKey(1))
    assert np.isfinite(np.asarray(out_t)).all()


@pytest.mark.parametrize("name", ["mlp", "gcn", "sage"])
def test_baseline_round_learns(name, small_graph):
    g = small_graph
    spec = BaselineSpec(name=name, feat_dim=g.features.shape[1], hidden=16,
                        out_dim=3, dropout=0.3)
    cfg = TrainConfig(lr=0.01, weight_decay=5e-4, epochs=120)
    tr, va, te = ratio_masks(g.n, seed=0)
    res = run_baseline_round(g, spec, cfg, tr, va, te, num_classes=3, seed=0)
    assert res.best_val_acc > 0.5
    assert res.metrics["accuracy"] > 0.45


def test_label_propagation_and_correct_smooth(small_graph):
    g = small_graph
    from pathnet_tpu.data import ratio_masks
    from pathnet_tpu.models.baselines import EdgeGraph
    from pathnet_tpu.models.baselines.cs import (correct_and_smooth,
                                                 label_propagation)
    eg = EdgeGraph.from_graph(g, norm="sym", add_self_loops=True)
    tr, va, te = ratio_masks(g.n, seed=0)
    y1 = jnp.asarray(np.eye(3)[g.labels], jnp.float32)
    z = label_propagation(eg, y1, jnp.asarray(tr))
    acc_lp = float((jnp.argmax(z, 1) == jnp.asarray(g.labels))[jnp.asarray(te)].mean())
    assert acc_lp > 1.0 / 3  # homophilous graph: LP beats chance
    soft = jnp.full((g.n, 3), 1.0 / 3)
    z2 = correct_and_smooth(eg, soft, y1, jnp.asarray(tr))
    acc_cs = float((jnp.argmax(z2, 1) == jnp.asarray(g.labels))[jnp.asarray(te)].mean())
    assert acc_cs > 1.0 / 3
    assert np.isfinite(np.asarray(z2)).all()


def test_homophily_measures(small_graph):
    from pathnet_tpu.data.homophily import (compatibility_matrix,
                                            edge_homophily, node_homophily)
    g = small_graph
    eh = edge_homophily(g, g.labels)
    nh = node_homophily(g, g.labels)
    assert 0 <= eh <= 1 and 0 <= nh <= 1
    assert eh > 1.0 / 3  # generator targeted homophily 0.6 over 3 classes
    cm = compatibility_matrix(g, g.labels, 3)
    np.testing.assert_allclose(cm.sum(1), 1.0, atol=1e-9)
    # diagonal dominance for a homophilous graph
    assert np.diag(cm).mean() > 1.0 / 3


def test_batchnorm_running_stats_match_torch():
    """BatchNormCtx reproduces torch BatchNorm1d: batch stats + running
    update in train mode, running stats in eval mode."""
    import torch

    from pathnet_tpu.models.baselines.ops import BatchNormCtx

    rng = np.random.default_rng(0)
    torch_bn = torch.nn.BatchNorm1d(6)
    state = [{"mean": jnp.zeros(6), "var": jnp.ones(6)}]
    xs = [rng.normal(size=(32, 6)).astype(np.float32) * (i + 1) + i
          for i in range(4)]
    for x in xs:  # train steps advance running stats
        torch_bn.train()
        yt = torch_bn(torch.tensor(x)).detach().numpy()
        bn = BatchNormCtx(state, train=True)
        yj = bn(jnp.asarray(x), jnp.ones(6), jnp.zeros(6))
        state = bn.new
        np.testing.assert_allclose(np.asarray(yj), yt, atol=2e-5)
    np.testing.assert_allclose(np.asarray(state[0]["mean"]),
                               torch_bn.running_mean.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(state[0]["var"]),
                               torch_bn.running_var.numpy(), rtol=2e-5)
    torch_bn.eval()
    xe = rng.normal(size=(8, 6)).astype(np.float32)
    yt = torch_bn(torch.tensor(xe)).detach().numpy()
    bn = BatchNormCtx(state, train=False)
    yj = bn(jnp.asarray(xe), jnp.ones(6), jnp.zeros(6))
    np.testing.assert_allclose(np.asarray(yj), yt, atol=2e-5)


def test_baseline_round_mesh_matches_single(small_graph):
    """--mesh for the baseline branch: sharded round == single-device."""
    from pathnet_tpu.parallel import make_mesh

    g = small_graph
    spec = BaselineSpec(name="gcn", feat_dim=g.features.shape[1], hidden=8,
                        out_dim=3, dropout=0.0)
    cfg = TrainConfig(lr=0.01, weight_decay=5e-4, epochs=30)
    tr, va, te = ratio_masks(g.n, seed=0)
    r1 = run_baseline_round(g, spec, cfg, tr, va, te, num_classes=3, seed=0)
    r2 = run_baseline_round(g, spec, cfg, tr, va, te, num_classes=3, seed=0,
                            mesh=make_mesh(n_devices=4))
    assert abs(r1.best_val_acc - r2.best_val_acc) < 1e-5
    assert abs(r1.metrics["accuracy"] - r2.metrics["accuracy"]) < 1e-5


def test_baseline_bf16_dtype_runs(small_graph):
    g = small_graph
    spec = BaselineSpec(name="gcn", feat_dim=g.features.shape[1], hidden=8,
                        out_dim=3, dropout=0.0, compute_dtype="bfloat16")
    cfg = TrainConfig(lr=0.01, weight_decay=5e-4, epochs=40)
    tr, va, te = ratio_masks(g.n, seed=0)
    res = run_baseline_round(g, spec, cfg, tr, va, te, num_classes=3, seed=0)
    assert res.best_val_acc > 0.5
