"""Training-throughput profile on the real chip: full PAGG epochs/s at
bgp-standin scale (n=63,977, nw=40, wl=4, hid=32 — the reference's
Electronics config uses hid=32, results/result_for_Electronics.txt).

One epoch = on-device sampling + train fwd/bwd + Adam + val eval + cond
test eval, inside the round scan (train/trainer.py).
"""
import sys
import time

sys.path.insert(0, ".")


def main():
    from pathnet_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pathnet_tpu.config import TrainConfig
    from pathnet_tpu.data import Graph, get_whole_mask
    from pathnet_tpu.models import PaggSpec
    from pathnet_tpu.sample import PathSampler
    from pathnet_tpu.train import run_round

    z = np.load("data/bench_cache/bgp_standin_63977.npz")
    g = Graph(n=int(z["n"]), src=z["src"], dst=z["dst"], prob=z["prob"],
              features=z["x"], labels=z["y"])
    ps = PathSampler.build(g, num_walks=40, walk_len=4)
    spec = PaggSpec(feat_dim=g.features.shape[1], hidden=32, out_dim=8,
                    walk_len=4, variant="hetero", dropout=0.7)
    tr, va, te = get_whole_mask(g.labels, seed=1)
    X = jnp.asarray(g.features)
    y = jnp.asarray(g.labels)

    for epochs in (5, 30):
        cfg = TrainConfig(epochs=epochs, scan_epochs=True, microbatch=8192)
        t0 = time.time()
        res = run_round(X, y, ps, spec, cfg, tr, va, te, num_classes=8, seed=0)
        dt = time.time() - t0
        print(f"epochs={epochs}: {dt:.1f}s wall "
              f"({dt / epochs * 1000:.0f} ms/epoch incl. compile on first)")
    n_eff = g.n * 40
    per_epoch = dt / epochs
    print(f"train throughput ≈ {n_eff / per_epoch / 1e6:.1f}M paths/epoch-s; "
          f"acc={res.metrics['accuracy']:.3f} val={res.best_val_acc:.3f}")


if __name__ == "__main__":
    main()
