"""Third-stage grad-phase probe (VERDICT r4 next #4): the grad phase runs at
101 GB/s — 12% of HBM roofline — and is 59% of the epoch
(results/roofline_train.json).  Probes, at bgp protocol scale (n=63977,
F=287, nw=40, wl=4, hid=64):

  1. dist_mode mask vs onehot (the [B,wl·H]@[wl·H,H] single-matmul form)
  2. microbatch {8192, 16384, 32768} over the full train chunk scan
  3. f32 vs bf16 at the best config

Timing uses a scalar-checksum readback (the method-form block_until_ready
lies on array outputs on this backend — PERF.md r4).  Writes
results/grad_probe3.json; the winners become PaggSpec/bench defaults.

Run on TPU: python scripts/grad_probe3.py
"""
import dataclasses
import json
import sys
import time

sys.path.insert(0, ".")


def main():
    from pathnet_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from pathnet_tpu.data import Graph
    from pathnet_tpu.models.pagg import PaggSpec, init_pagg_params
    from pathnet_tpu.sample import PathSampler
    from pathnet_tpu.train.trainer import _chunked_grads, _pad_chunks

    nw, wl, hidden, F = 40, 4, 64, 287
    z = np.load("data/bench_cache/bgp_standin_63977.npz")
    n = int(z["n"])
    rng = np.random.default_rng(0)
    x = rng.normal(size=(n, F)).astype(np.float32)
    g = Graph(n=n, src=z["src"], dst=z["dst"], prob=z["prob"],
              features=x, labels=z["y"], name="bgp_standin_F287")
    ps = PathSampler.build(g, num_walks=nw, walk_len=wl, kind="merw")
    X = jnp.asarray(g.features)
    y = jnp.asarray(g.labels)
    paths, dists = jax.block_until_ready(jax.jit(ps.sample)(jax.random.PRNGKey(1)))
    key = jax.random.PRNGKey(2)
    train_idx = np.arange(int(0.48 * n), dtype=np.int32)   # protocol's 48%

    results = {"n": n, "F": F, "hidden": hidden, "nw": nw, "wl": wl,
               "train_nodes": len(train_idx)}

    def timeit(fn, reps=3):
        # scalar readback forces completion (array block_until_ready lies)
        t0 = time.time()
        s = float(fn())
        compile_s = time.time() - t0
        ts = []
        for _ in range(reps):
            t0 = time.time()
            s = float(fn())
            ts.append(time.time() - t0)
        return sorted(ts)[len(ts) // 2], compile_s, s

    def probe(tag, mb, dist_mode, dtype):
        spec = PaggSpec(feat_dim=F, hidden=hidden, out_dim=8, walk_len=wl,
                        variant="hetero", dist_mode=dist_mode,
                        compute_dtype=dtype)
        params = init_pagg_params(jax.random.PRNGKey(0), spec)
        tr_c, tr_w = (jnp.asarray(a) for a in _pad_chunks(train_idx, mb))

        @jax.jit
        def full_grads():
            gr = _chunked_grads(params, X, paths, dists, tr_c, y, tr_w,
                                spec, key)
            return sum(jnp.sum(jnp.abs(l).astype(jnp.float32))
                       for l in jax.tree_util.tree_leaves(gr))

        ms, compile_s, s = timeit(full_grads)
        results[tag] = {"ms": round(ms * 1e3, 1),
                        "compile_s": round(compile_s, 1),
                        "checksum": s}
        print(f"{tag}: {results[tag]}", flush=True)
        with open("results/grad_probe3.json", "w") as f:
            json.dump(results, f, indent=2)   # flush per probe (a config
            # can crash the remote-compile service; keep what we measured)

    # 1) dist_mode at the r4 default microbatch
    probe("mb8192_mask_f32", 8192, "mask", "float32")
    probe("mb8192_onehot_f32", 8192, "onehot", "float32")
    # 2) microbatch sweep with both modes' winner checked per size
    for mb in (16384, 32768):
        probe(f"mb{mb}_mask_f32", mb, "mask", "float32")
        probe(f"mb{mb}_onehot_f32", mb, "onehot", "float32")
    # 3) bf16 at each size (bench candidate default)
    for mb in (8192, 16384, 32768):
        probe(f"mb{mb}_onehot_bf16", mb, "onehot", "bfloat16")
    probe("mb8192_mask_bf16", 8192, "mask", "bfloat16")

    with open("results/grad_probe3.json", "w") as f:
        json.dump(results, f, indent=2)
    print("wrote results/grad_probe3.json")


if __name__ == "__main__":
    main()
