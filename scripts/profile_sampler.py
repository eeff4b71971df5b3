"""Phase-level profiling of the on-device sampler on the real TPU.

Separates: alias-roll walk steps, CDF walk steps, distance-table gather,
and RNG — to locate which formulation is gather-bound on this chip.
"""
import sys
import time

sys.path.insert(0, ".")


def timeit(fn, *args, iters=10, warmup=2):
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters


def main():
    from pathnet_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pathnet_tpu.data import synthetic_graph
    from pathnet_tpu.merw import merw_graph
    from pathnet_tpu.sample import PathSampler, sample_paths
    from pathnet_tpu.sample.alias import CdfSampler

    n, nw, wl = 63977, 40, 4
    g = merw_graph(synthetic_graph(n=n, avg_deg=10.0, num_classes=8,
                                   homophily=0.37, feat_dim=8, seed=42))
    ps = PathSampler.build(g, num_walks=nw, walk_len=wl,
                           distance_backend="dense", distance_chunk=256)
    print("built", file=sys.stderr)
    key = jax.random.PRNGKey(0)
    starts = jnp.arange(n, dtype=jnp.int32)
    W = n * nw

    # 1. alias walk only
    f_alias = jax.jit(lambda k: sample_paths(ps.sampler, k, starts, nw, wl))
    paths = f_alias(key)
    dt = timeit(f_alias, key)
    print(f"alias walk: {dt * 1e3:.1f} ms/epoch ({W * 1 / dt / 1e6:.1f}M paths/s)")

    # 2. cdf walk only
    cdf = CdfSampler.from_device_graph(
        __import__('pathnet_tpu.data.graph', fromlist=['DeviceGraph'])
        .DeviceGraph.from_graph(g))
    f_cdf = jax.jit(lambda k: sample_paths(cdf, k, starts, nw, wl))
    dt = timeit(f_cdf, key)
    print(f"cdf walk:   {dt * 1e3:.1f} ms/epoch ({W / dt / 1e6:.1f}M paths/s)")

    # 3. dist gather only (2-D advanced indexing)
    tbl = ps.dist_table

    def f_dist(p):
        return tbl[starts[:, None, None], p].astype(jnp.int32)

    f_dist = jax.jit(f_dist)
    dt = timeit(f_dist, paths)
    print(f"dist gather (2d): {dt * 1e3:.1f} ms/epoch")

    # 4. dist gather via per-row take_along_axis
    def f_dist2(p):
        flat = p.reshape(n, nw * wl)
        out = jnp.take_along_axis(tbl, flat, axis=1)
        return out.reshape(n, nw, wl).astype(jnp.int32)

    f_dist2 = jax.jit(f_dist2)
    dt = timeit(f_dist2, paths)
    print(f"dist gather (take_along_axis): {dt * 1e3:.1f} ms/epoch")

    # 5. rng only
    def f_rng(k):
        ks = jax.random.split(k, wl - 1)
        return [jax.random.uniform(kk, (W,)) for kk in ks]

    f_rng = jax.jit(f_rng)
    dt = timeit(f_rng, key)
    print(f"rng: {dt * 1e3:.1f} ms/epoch")

    # 6. one scalar-gather step in isolation (lo table)
    flat_lo = ps.sampler.lo.reshape(-1)
    idx = jnp.asarray(np.random.default_rng(0).integers(
        0, flat_lo.shape[0], size=W), jnp.int32)

    f_g = jax.jit(lambda i: jnp.take(flat_lo, i))
    dt = timeit(f_g, idx)
    print(f"single scalar gather of {W} from [{flat_lo.shape[0]}]: {dt * 1e3:.1f} ms")

    # 7. row gather [W, D] from [n, D]
    curs = jnp.asarray(np.random.default_rng(1).integers(0, n, size=W), jnp.int32)
    f_r = jax.jit(lambda c: ps.sampler.lo[c])
    dt = timeit(f_r, curs)
    print(f"row gather [W, {ps.sampler.lo.shape[1]}]: {dt * 1e3:.1f} ms")


if __name__ == "__main__":
    main()
