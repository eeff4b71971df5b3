"""Weak-scaling proxy on the virtual CPU mesh (VERDICT r2 #6).

Fixed per-device load: n_nodes = BASE_N * d for d in (1, 2, 4, 8); one full
SPMD train step (sample + fwd/bwd + Adam + val eval) per mesh size, X
graph-partitioned.  Perfect weak scaling = flat step time as d grows.  On
the virtual CPU mesh all "devices" share one socket, so the absolute times
compress and the curve is only a *logic* proxy (collective volumes scale
correctly; compute parallelism does not) — the honest efficiency number
needs a real multi-chip slice.  What this measures: the collective overhead
growth of the sharded program as the mesh widens, normalized to d=1.

Writes results/weak_scaling.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, ".")

from pathnet_tpu.utils import enable_compilation_cache, force_cpu_devices

force_cpu_devices(8)
enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

BASE_N = 2048
NW, WL, HID = 8, 4, 32


def one(d):
    from pathnet_tpu.data import synthetic_graph
    from pathnet_tpu.merw import merw_graph
    from pathnet_tpu.models import PaggSpec, init_pagg_params
    from pathnet_tpu.parallel import make_mesh, sharded_train_step
    from pathnet_tpu.sample import PathSampler
    from pathnet_tpu.train import make_optimizer

    n = BASE_N * d
    g = merw_graph(synthetic_graph(n=n, avg_deg=8, num_classes=4,
                                   feat_dim=64, homophily=0.4, seed=1))
    ps = PathSampler.build(g, num_walks=NW, walk_len=WL)
    spec = PaggSpec(feat_dim=64, hidden=HID, out_dim=4, walk_len=WL,
                    variant="hetero")
    params = init_pagg_params(jax.random.PRNGKey(0), spec)
    optimizer = make_optimizer(lr=5e-3, weight_decay=5e-4)
    opt_state = optimizer.init(params)
    mesh = make_mesh(n_devices=d)
    step = sharded_train_step(mesh, spec, optimizer, num_classes=4,
                              shard_features=True)
    t = (n // 2) // d * d
    tr = jnp.arange(t, dtype=jnp.int32)
    va = jnp.arange(t, 2 * t, dtype=jnp.int32)
    X = jnp.asarray(g.features)
    y = jnp.asarray(g.labels)
    args = (params, opt_state, X, y, ps, tr, va, jax.random.PRNGKey(2))
    jax.block_until_ready(step(*args)[2])
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(step(*args)[2])
        ts.append(time.perf_counter() - t0)
    return n, sorted(ts)[len(ts) // 2]


def main():
    out = {"base_n_per_device": BASE_N, "nw": NW, "wl": WL,
           "note": "virtual CPU mesh: devices share one socket, so times "
                   "include serialized compute; the d-growth of overhead is "
                   "the signal, not absolute efficiency", "points": []}
    t1 = None
    for d in (1, 2, 4, 8):
        n, dt = one(d)
        t1 = t1 or dt
        out["points"].append({"devices": d, "n_nodes": n,
                              "step_ms": round(dt * 1e3, 1),
                              "vs_d1": round(dt / t1, 2),
                              # shared-socket ideal is d x t1 (total work
                              # grows with d but cores don't); >1.0 = added
                              # collective/replication overhead
                              "overhead_vs_shared_socket_ideal":
                                  round(dt / (t1 * d), 2)})
        print(out["points"][-1], flush=True)
    os.makedirs("results", exist_ok=True)
    with open("results/weak_scaling.json", "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
