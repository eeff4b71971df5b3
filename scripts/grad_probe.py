"""Locate the training-step wall: is it the gather-backward scatter-add?

The PAGG forward gathers per-path node features ``h[paths]`` from the
projected feature table; its VJP is a scatter-add of ~1.3M H-rows per
microbatch into [n, H] — a latency-bound op on TPU.  But h's gradient is
only needed to form dW0 (X is constant), so the scatter is avoidable by
gathering X rows FIRST and projecting after: nei = X[paths] @ W0 — the
matmul VJP gives dW0 = X[paths]^T @ dnei with no scatter at all.

This probe times, at bgp-standin scale (one 8192-node microbatch):
  fwd               — current forward
  grad_current      — grad of the current forward (scatter in VJP)
  grad_gather_only  — grad of sum(h[paths]) alone (isolates the scatter)
  grad_gather_first — grad with X[paths] @ W0 formulation (no scatter)

Writes results/grad_probe.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, ".")


def timeit(c, *args, reps=5):
    import jax
    jax.block_until_ready(c(*args))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        jax.block_until_ready(c(*args))
        ts.append(time.time() - t0)
    return sorted(ts)[len(ts) // 2]


def main():
    from pathnet_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pathnet_tpu.data import Graph
    from pathnet_tpu.models.pagg import PaggSpec, init_pagg_params, pagg_forward
    from pathnet_tpu.sample import PathSampler

    nw, wl, hidden, mb = 40, 4, 64, 8192
    z = np.load("data/bench_cache/bgp_standin_63977.npz")
    g = Graph(n=int(z["n"]), src=z["src"], dst=z["dst"], prob=z["prob"],
              features=z["x"], labels=z["y"], name="bgp_standin")
    ps = PathSampler.build(g, num_walks=nw, walk_len=wl, kind="merw")
    spec = PaggSpec(feat_dim=g.features.shape[1], hidden=hidden,
                    out_dim=8, walk_len=wl, variant="hetero")
    X = jnp.asarray(g.features)
    y = jnp.asarray(g.labels)
    params = init_pagg_params(jax.random.PRNGKey(0), spec)
    paths, dists = jax.jit(ps.sample)(jax.random.PRNGKey(1))
    idx = jnp.arange(mb, dtype=jnp.int32)
    p_mb = jax.block_until_ready(paths[idx])
    d_mb = jax.block_until_ready(dists[idx])

    results = {}

    def add(name, f, *args, reps=5):
        t0 = time.time()
        c = jax.jit(f).lower(*args).compile()
        comp = time.time() - t0
        dt = timeit(c, *args, reps=reps)
        results[name] = {"ms": round(dt * 1e3, 2), "compile_s": round(comp, 1)}
        print(f"# {name:18s} {dt*1e3:8.2f} ms (compile {comp:.0f}s)",
              file=sys.stderr)

    import optax

    def loss(p, key):
        logits = pagg_forward(p, X, p_mb, d_mb, idx, spec, train=True, key=key)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, y[idx]).mean()

    key = jax.random.PRNGKey(2)
    add("fwd", lambda p, k: loss(p, k), params, key)
    add("grad_current", lambda p, k: jax.tree_util.tree_reduce(
        lambda a, b: a + jnp.sum(b), jax.grad(loss)(p, k), 0.0), params, key,
        reps=3)

    # isolate the gather VJP scatter
    def gather_loss(p):
        h = X @ p["fc0"]["w"] + p["fc0"]["b"]
        return jnp.sum(h[p_mb])

    add("grad_gather_only", lambda p: jnp.sum(
        jax.grad(gather_loss)(p)["fc0"]["w"]), params, reps=3)

    # scatter-free: gather X rows first, project after
    def gather_first_loss(p):
        xg = X[p_mb]                                  # [mb, nw, wl, F] no-grad
        nei = xg @ p["fc0"]["w"] + p["fc0"]["b"]
        return jnp.sum(nei)

    add("grad_gather_first", lambda p: jnp.sum(
        jax.grad(gather_first_loss)(p)["fc0"]["w"]), params, reps=3)

    os.makedirs("results", exist_ok=True)
    with open("results/grad_probe.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
