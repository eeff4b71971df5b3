"""Weak-scaling with per-phase breakdown on the virtual CPU mesh (r4).

Fixed per-device load: n_nodes = BASE_N * d for d in (1, 2, 4, 8), X
graph-partitioned.  r3 measured a superlinear total-step overhead
(1.05/1.41/2.05x at d=2/4/8) with no attribution; this version times each
phase as its own jitted SPMD program:

  sample    — the sharded walk+distance kernel
  grad      — fwd/bwd + Adam given the path tensor (includes the GSPMD
              feature exchange for the gathers)
  eval      — the val forward
  exchange  — the cross-shard feature gather alone, per implementation
              (gspmd / ring / sparse), so the superlinear term can be
              attributed to communication volume rather than compute

Analytically the gspmd/ring exchange moves (d-1)*(n/d)*H words per device
per gather — with n = BASE_N*d that is ~(d-1)*BASE_N*H: per-device comm
GROWS LINEARLY with the mesh in weak scaling, which is exactly the
superlinear signature.  The sparse ownership-keyed exchange moves
(d-1)*m*H via psum_scatter (zero-padded contributions), same growth; a
capped all-to-all would be the flat-volume fix (see PERF.md projection).

Virtual-mesh caveat unchanged: all devices share one 2-core socket, so
absolute times serialize compute; the d-growth of each phase normalized to
its d=1 time is the signal.

Writes results/weak_scaling.json (v2 schema, keeps the r3 note).
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


def timed(fn, reps=5):
    fn()  # warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def one(d):
    from jax.sharding import NamedSharding, PartitionSpec as P
    from pathnet_tpu.data import synthetic_graph
    from pathnet_tpu.merw import merw_graph
    from pathnet_tpu.models import PaggSpec, init_pagg_params
    from pathnet_tpu.models.pagg import pagg_forward
    from pathnet_tpu.parallel import make_mesh
    from pathnet_tpu.parallel.ring import make_ring_gather
    from pathnet_tpu.parallel.sparse import make_sparse_gather_sharded
    from pathnet_tpu.sample import PathSampler
    from pathnet_tpu.train import make_optimizer
    import optax

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
    ds = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())

    X = jax.device_put(jnp.asarray(g.features), ds)
    y = jax.device_put(jnp.asarray(g.labels), repl)
    params = jax.device_put(params, repl)
    opt_state = jax.device_put(opt_state, repl)
    ps = jax.tree_util.tree_map(lambda a: jax.device_put(a, repl), ps)
    t = (n // 2) // d * d
    tr = jnp.arange(t, dtype=jnp.int32)
    va = jnp.arange(t, 2 * t, dtype=jnp.int32)

    @jax.jit
    def sample(key):
        starts = jax.lax.with_sharding_constraint(
            jnp.arange(ps.sampler.n, dtype=jnp.int32), ds)
        paths, dists = ps.sample(key, starts)
        return (jax.lax.with_sharding_constraint(paths, ds),
                jax.lax.with_sharding_constraint(dists, ds))

    paths, dists = jax.block_until_ready(sample(jax.random.PRNGKey(2)))

    def shard(t):
        # constrain the gathered batch to the data sharding — without this
        # GSPMD replicates the whole batch on every device (the exact bug
        # class fixed in trainer.py r3; the r4a version of this probe
        # omitted it and measured a 10x grad blowup that was the probe's,
        # not the trainer's)
        return jax.lax.with_sharding_constraint(t, ds)

    @jax.jit
    def grad_step(params, opt_state, paths, dists, key):
        def loss_fn(p):
            logits = pagg_forward(p, X, shard(paths[tr]), shard(dists[tr]),
                                  tr, spec, train=True, key=key)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y[tr]).mean()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def evalf(params, paths, dists):
        logits = pagg_forward(params, X, shard(paths[va]), shard(dists[va]),
                              va, spec, train=False)
        return jnp.mean((jnp.argmax(logits, -1) == y[va]).astype(jnp.float32))

    key = jax.random.PRNGKey(3)
    res = {
        "sample_ms": timed(lambda: sample(key)[0]) * 1e3,
        "grad_ms": timed(lambda: grad_step(params, opt_state, paths, dists,
                                           key)[2]) * 1e3,
        "eval_ms": timed(lambda: evalf(params, paths, dists)) * 1e3,
    }

    # exchange microbench: gather m sharded feature rows per implementation
    m = t * NW * WL
    idx = jax.device_put(
        jax.random.randint(jax.random.PRNGKey(4), (m,), 0, n, jnp.int32), ds)
    impls = {"gspmd": lambda h, i: h[i],
             "ring": make_ring_gather(mesh, "data"),
             "sparse": make_sparse_gather_sharded(mesh, "data")}
    for nm, fn in impls.items():
        g_jit = jax.jit(lambda h, i, fn=fn: fn(h, i).sum())
        try:
            res[f"exchange_{nm}_ms"] = timed(lambda: g_jit(X, idx)) * 1e3
        except Exception as e:  # noqa: BLE001 — record, keep scaling run alive
            res[f"exchange_{nm}_ms"] = None
            print(f"  exchange {nm} failed at d={d}: {e!r}", flush=True)
    return n, res


def main():
    out = {"base_n_per_device": BASE_N, "nw": NW, "wl": WL,
           "note": "virtual CPU mesh: devices share one socket, so times "
                   "include serialized compute; the d-growth of each phase "
                   "normalized to d=1 is the signal, not absolute "
                   "efficiency", "points": []}
    base = None
    for d in (1, 2, 4, 8):
        n, res = one(d)
        base = base or res
        point = {"devices": d, "n_nodes": n}
        for k, v in res.items():
            point[k] = round(v, 1) if v is not None else None
            if v is not None and base.get(k):
                point[k + "_overhead"] = round(v / (base[k] * d), 2)
        out["points"].append(point)
        print(point, flush=True)
    os.makedirs("results", exist_ok=True)
    with open("results/weak_scaling.json", "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
