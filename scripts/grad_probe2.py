"""Second-stage training-step probe: remat x gather_mode grid (one 8192-node
microbatch at bgp-standin scale), plus bf16.  Decides the default config for
the large-graph protocol runs.  Writes results/grad_probe2.json."""
import dataclasses
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
    import optax

    from pathnet_tpu.data import Graph
    from pathnet_tpu.models.pagg import PaggSpec, init_pagg_params, pagg_forward
    from pathnet_tpu.sample import PathSampler

    nw, wl, hidden, mb = 40, 4, 64, 8192
    z = np.load("data/bench_cache/bgp_standin_63977.npz")
    g = Graph(n=int(z["n"]), src=z["src"], dst=z["dst"], prob=z["prob"],
              features=z["x"], labels=z["y"], name="bgp_standin")
    ps = PathSampler.build(g, num_walks=nw, walk_len=wl, kind="merw")
    X = jnp.asarray(g.features)
    y = jnp.asarray(g.labels)
    paths, dists = jax.jit(ps.sample)(jax.random.PRNGKey(1))
    idx = jnp.arange(mb, dtype=jnp.int32)
    p_mb = jax.block_until_ready(paths[idx])
    d_mb = jax.block_until_ready(dists[idx])
    key = jax.random.PRNGKey(2)

    results = {"feat_dim": g.features.shape[1], "hidden": hidden, "mb": mb}

    def probe(tag, **kw):
        spec = PaggSpec(feat_dim=g.features.shape[1], hidden=hidden,
                        out_dim=8, walk_len=wl, variant="hetero", **kw)
        params = init_pagg_params(jax.random.PRNGKey(0), spec)

        def loss(p, k):
            logits = pagg_forward(p, X, p_mb, d_mb, idx, spec, train=True,
                                  key=k)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y[idx]).mean()

        f = jax.jit(lambda p, k: jax.tree_util.tree_reduce(
            lambda a, b: a + jnp.sum(b), jax.grad(loss)(p, k), 0.0))
        t0 = time.time()
        c = f.lower(params, key).compile()
        comp = time.time() - t0
        mem = c.memory_analysis()
        peak = getattr(mem, "temp_size_in_bytes", 0) if mem else 0
        dt = timeit(c, params, key, reps=3)
        results[tag] = {"ms": round(dt * 1e3, 2), "compile_s": round(comp, 1),
                        "temp_bytes_GB": round(peak / 1e9, 2)}
        print(f"# {tag:28s} {dt*1e3:8.2f} ms  temp={peak/1e9:.2f} GB "
              f"(compile {comp:.0f}s)", file=sys.stderr)

    probe("remat_h", remat=True, gather_mode="h")
    probe("remat_x", remat=True, gather_mode="x")
    probe("noremat_h", remat=False, gather_mode="h")
    probe("noremat_x", remat=False, gather_mode="x")
    probe("noremat_x_bf16", remat=False, gather_mode="x",
          compute_dtype="bfloat16")
    probe("remat_x_bf16", remat=True, gather_mode="x",
          compute_dtype="bfloat16")

    os.makedirs("results", exist_ok=True)
    with open("results/grad_probe2.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
