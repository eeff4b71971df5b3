"""Microbenchmark of walk-step formulations on the real chip.

The roofline (results/roofline_train.json) shows the walk scan is the
sampler wall: ~200 ms/epoch at bgp-standin scale where the pure byte cost
of the row gathers is ~5 ms.  This probe times each candidate step
formulation in isolation (3-step scan over 2.56M walkers, exactly the
sampler's shape) to find which one the TPU actually likes:

  cdf        — current CdfSampler.step: two row gathers ([W,D] cdf + nbr)
  cdf_packed — nbr bitcast into the cdf row -> ONE [W, 2D] row gather
  cdf_sorted — sort walkers by node, gather with indices_are_sorted, unsort
  alias      — AliasSampler.step: 4 flat scalar gathers
  gather_raw — cdf[cur] alone (the byte floor for one step)

Writes results/walk_probe.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, ".")


def timeit(fn, *args, reps=5):
    import jax
    jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        jax.block_until_ready(fn(*args))
        ts.append(time.time() - t0)
    return sorted(ts)[len(ts) // 2]


def main():
    from pathnet_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pathnet_tpu.data import Graph, DeviceGraph
    from pathnet_tpu.sample.alias import AliasSampler, CdfSampler

    nw, wl = 40, 4
    z = np.load("data/bench_cache/bgp_standin_63977.npz")
    g = Graph(n=int(z["n"]), src=z["src"], dst=z["dst"], prob=z["prob"],
              features=z["x"], labels=z["y"], name="bgp_standin")
    dg = DeviceGraph.from_graph(g)
    cdfs = CdfSampler.from_device_graph(dg)
    alias = AliasSampler.from_device_graph(dg)
    n, D = cdfs.nbr.shape
    W = n * nw
    print(f"# n={n} D={D} W={W}", file=sys.stderr)

    key = jax.random.PRNGKey(0)
    starts = jnp.repeat(jnp.arange(n, dtype=jnp.int32), nw)

    def run_scan(step):
        def f(key):
            keys = jax.random.split(key, wl - 1)
            def body(cur, k):
                nxt = step(cur, k)
                return nxt, cur
            last, trail = jax.lax.scan(body, starts, keys)
            return jnp.sum(last) + jnp.sum(trail)
        return jax.jit(f)

    results = {"n": n, "D": D, "W": W, "wl": wl, "variants": {}}

    def add(name, fn, *args):
        t0 = time.time()
        c = jax.jit(fn).lower(*args).compile() if not hasattr(fn, "lower") \
            else fn.lower(*args).compile()
        comp = time.time() - t0
        dt = timeit(c, *args)
        results["variants"][name] = {"ms": round(dt * 1e3, 2),
                                     "compile_s": round(comp, 1)}
        print(f"# {name:12s} {dt*1e3:8.2f} ms (compile {comp:.0f}s)",
              file=sys.stderr)

    # 0. raw row gather floor
    add("gather_raw", lambda cur: jnp.sum(cdfs.cdf[cur]), starts)
    # 0b. flat scalar gather floor (W scalars)
    add("scalar_raw", lambda cur: jnp.sum(jnp.take(cdfs.deg, cur)), starts)

    # 1. current cdf
    add("cdf", run_scan(cdfs.step), key)

    # 2. packed: one row gather fetching cdf and nbr together
    packed = jnp.concatenate(
        [cdfs.cdf, jax.lax.bitcast_convert_type(cdfs.nbr, jnp.float32)],
        axis=1)                                     # [n, 2D]
    degj = cdfs.deg

    def packed_step(cur, k):
        u = jax.random.uniform(k, cur.shape)
        rows = packed[cur]                          # [W, 2D] one gather
        cdf_r = rows[:, :D]
        nbr_r = jax.lax.bitcast_convert_type(rows[:, D:], jnp.int32)
        idx = jnp.sum(cdf_r < u[:, None], axis=1)
        idx = jnp.minimum(idx, jnp.maximum(degj[cur], 1) - 1)
        return jnp.take_along_axis(nbr_r, idx[:, None], axis=1)[:, 0]

    add("cdf_packed", run_scan(packed_step), key)

    # 3. sorted-indices gather
    def sorted_step(cur, k):
        order = jnp.argsort(cur)
        cs = cur[order]
        u = jax.random.uniform(k, cur.shape)
        rows = jnp.take(cdfs.cdf, cs, axis=0, indices_are_sorted=True)
        nbrs = jnp.take(cdfs.nbr, cs, axis=0, indices_are_sorted=True)
        idx = jnp.sum(rows < u[order][:, None], axis=1)
        idx = jnp.minimum(idx, jnp.maximum(degj[cs], 1) - 1)
        nxt_sorted = jnp.take_along_axis(nbrs, idx[:, None], axis=1)[:, 0]
        inv = jnp.zeros_like(order).at[order].set(jnp.arange(cur.shape[0]))
        return nxt_sorted[inv]

    add("cdf_sorted", run_scan(sorted_step), key)

    # 4. alias (4 flat scalar gathers)
    add("alias", run_scan(alias.step), key)

    # 5. uint16 nbr ids (n < 65536): halves the nbr gather bytes
    if n <= 65536:
        nbr16 = cdfs.nbr.astype(jnp.uint16)

        def u16_step(cur, k):
            u = jax.random.uniform(k, cur.shape)
            rows = cdfs.cdf[cur]
            idx = jnp.sum(rows < u[:, None], axis=1)
            idx = jnp.minimum(idx, jnp.maximum(degj[cur], 1) - 1)
            nx = jnp.take_along_axis(nbr16[cur], idx[:, None], axis=1)[:, 0]
            return nx.astype(jnp.int32)

        add("cdf_u16", run_scan(u16_step), key)

    os.makedirs("results", exist_ok=True)
    with open("results/walk_probe.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results["variants"]))


if __name__ == "__main__":
    main()
