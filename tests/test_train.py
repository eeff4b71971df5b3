import numpy as np
import jax.numpy as jnp

from pathnet_tpu.config import TrainConfig
from pathnet_tpu.data import ratio_masks
from pathnet_tpu.models import PaggSpec
from pathnet_tpu.sample import PathSampler
from pathnet_tpu.train import run_round, format_result_line, aggregate_rounds


def _setup(small_graph, epochs, scan):
    g = small_graph
    ps = PathSampler.build(g, num_walks=8, walk_len=3)
    X = jnp.asarray(g.features)
    y = jnp.asarray(g.labels)
    spec = PaggSpec(feat_dim=g.features.shape[1], hidden=16, out_dim=3,
                    walk_len=3, variant="hetero", dropout=0.3)
    cfg = TrainConfig(lr=0.01, weight_decay=5e-4, epochs=epochs,
                      scan_epochs=scan)
    masks = ratio_masks(g.n, seed=0)
    return X, y, ps, spec, cfg, masks


def test_round_learns(small_graph):
    X, y, ps, spec, cfg, (tr, va, te) = _setup(small_graph, epochs=150, scan=True)
    res = run_round(X, y, ps, spec, cfg, tr, va, te, num_classes=3, seed=0,
                    track_history=True)
    assert res.best_val_acc > 0.55          # well above 1/3 chance
    assert res.metrics["accuracy"] > 0.5
    assert 0 <= res.metrics["macro_f1"] <= 1
    assert len(res.history) == 150


def test_scan_and_python_loop_agree(small_graph):
    X, y, ps, spec, cfg, (tr, va, te) = _setup(small_graph, epochs=12, scan=True)
    r_scan = run_round(X, y, ps, spec, cfg, tr, va, te, num_classes=3, seed=1)
    cfg_py = TrainConfig(lr=cfg.lr, weight_decay=cfg.weight_decay,
                         epochs=12, scan_epochs=False)
    r_py = run_round(X, y, ps, spec, cfg_py, tr, va, te, num_classes=3, seed=1)
    assert abs(r_scan.best_val_acc - r_py.best_val_acc) < 1e-6
    for k in r_scan.metrics:
        assert abs(r_scan.metrics[k] - r_py.metrics[k]) < 1e-6


def test_result_line_format():
    class R:
        def __init__(self, a):
            self.metrics = {"accuracy": a, "macro_precision": a,
                            "macro_recall": a, "macro_f1": a, "micro_f1": a}
    agg = aggregate_rounds([R(0.9), R(0.92)])
    line = format_result_line("cornell", agg)
    assert line.startswith("pathnet Avg for cornell: acc0.9100 ± 0.0100")
    assert "maf1" in line and "mif1" in line


def test_microbatch_matches_full_batch(small_graph):
    """Gradient-accumulation microbatching = full batch (dropout off; the
    only nondeterminism between the modes is dropout key layout)."""
    import dataclasses
    X, y, ps, spec, cfg, (tr, va, te) = _setup(small_graph, epochs=15, scan=True)
    spec0 = dataclasses.replace(spec, dropout=0.0)
    r_full = run_round(X, y, ps, spec0, cfg, tr, va, te, num_classes=3, seed=3)
    cfg_mb = TrainConfig(lr=cfg.lr, weight_decay=cfg.weight_decay, epochs=15,
                         scan_epochs=True, microbatch=16)
    r_mb = run_round(X, y, ps, spec0, cfg_mb, tr, va, te, num_classes=3, seed=3)
    assert abs(r_full.best_val_acc - r_mb.best_val_acc) < 1e-5
    for k in r_full.metrics:
        assert abs(r_full.metrics[k] - r_mb.metrics[k]) < 1e-5
