"""wl=5 / k-hop distance backend at gen_epoch scale (VERDICT r4 next #6).

Builds the k-hop membership tables for the bgp stand-in (n=63,977, the
largest graph in the registry) and samples wl=5 epochs on-device, recording
table widths, build time, and ms/epoch.  This is the configuration the
reference's length ablation runs at wl=5 (draw_figs/length.py:53) on its
gen_epoch tier — previously only exercised at n=183.

Writes results/khop_scale.json.  Run on TPU: python scripts/khop_scale_probe.py
"""
import json
import sys
import time

sys.path.insert(0, ".")


def main():
    from pathnet_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import numpy as np

    from pathnet_tpu.data import Graph
    from pathnet_tpu.sample import PathSampler
    from pathnet_tpu.sample.distance import build_khop_tables

    z = np.load("data/bench_cache/bgp_standin_63977.npz")
    g = Graph(n=int(z["n"]), src=z["src"], dst=z["dst"], prob=z["prob"],
              features=z["x"], labels=z["y"], name="bgp_standin")
    nw, wl = 40, 5

    t0 = time.time()
    tables = build_khop_tables(g, wl - 1)
    build_s = time.time() - t0
    widths = [int(t.shape[1]) for t in tables]
    bytes_total = sum(int(t.size) * 4 for t in tables)
    print(f"khop tables: widths={widths} build={build_s:.1f}s "
          f"mem={bytes_total / 1e9:.2f} GB", flush=True)
    del tables   # free HBM before the sampler builds its own (or falls back
                 # to the dense table; double residency thrashes the chip)

    t0 = time.time()
    ps = PathSampler.build(g, num_walks=nw, walk_len=wl, kind="merw",
                           distance_backend="khop")
    build_sampler_s = time.time() - t0
    fell_back = ps.khop is None
    # pass the sampler as an ARGUMENT: jitting the bound method captures the
    # multi-GB tables as program constants (4 GB through the compile tunnel)
    sample = jax.jit(lambda p, k: p.sample(k))

    key = jax.random.PRNGKey(0)
    # scalar readback forces completion (array block_until_ready lies on
    # this backend — PERF.md r4)
    t0 = time.time()
    paths, dists = sample(ps, key)
    cs = int(np.asarray(dists.sum(), dtype=np.int64)) + int(
        np.asarray(paths[-1, -1, -1]))
    compile_s = time.time() - t0
    reps = 5
    ts = []
    for i in range(reps):
        t0 = time.time()
        paths, dists = sample(ps, jax.random.fold_in(key, i))
        cs = int(np.asarray(dists.sum(), dtype=np.int64))
        ts.append(time.time() - t0)
    ms = sorted(ts)[len(ts) // 2] * 1e3
    dmax = int(np.asarray(dists.max()))
    print(f"wl=5 sample: {ms:.1f} ms/epoch (compile {compile_s:.1f}s) "
          f"dist_max={dmax} checksum={cs}", flush=True)
    assert dmax <= wl - 1

    out = {"n": g.n, "nw": nw, "wl": wl,
           "khop_widths": widths, "khop_build_s": round(build_s, 1),
           "khop_bytes_GB": round(bytes_total / 1e9, 3),
           "fell_back_to_dense": bool(fell_back),
           "sampler_build_s": round(build_sampler_s, 1),
           "sample_ms_per_epoch": round(ms, 1),
           "compile_s": round(compile_s, 1),
           "device": str(jax.devices()[0])}
    with open("results/khop_scale.json", "w") as f:
        json.dump(out, f, indent=2)
    print("wrote results/khop_scale.json")


if __name__ == "__main__":
    main()
