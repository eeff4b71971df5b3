"""Benchmark: on-device path sampling throughput (the gen_epoch equivalent).

Measures sampled paths/s per chip on the Bgp-scale stand-in (n=63,977,
num_walks=40, walk_len=4 — BASELINE.json's headline config), including hop-
distance resolution, i.e. the full per-epoch record the reference's offline
C++ pipeline produces as text (gen_epoch_merw.cpp) and the torch loop
re-parses from disk every epoch (PathNet_run.py:317-334).

Baseline: the numpy-vectorized host-CPU reference sampler
(scripts/cpu_reference.py) measured on this host — a *conservative* stand-in
for the "PyG CPU" baseline in BASELINE.md (the reference's actual
single-thread printf-bound C++ sampler is far slower).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Measured via scripts/cpu_reference.py on this host (2x 2.1GHz CPUs):
# numpy alias-roll sampling, n=63977, nw=40, wl=4 → 1,248,703 paths/s.
CPU_BASELINE_PATHS_PER_S = 1_250_000.0


def main():
    from pathnet_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import numpy as np

    from pathnet_tpu.data import synthetic_graph
    from pathnet_tpu.merw import merw_graph
    from pathnet_tpu.sample import PathSampler

    n, nw, wl = 63977, 40, 4
    t0 = time.time()
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data",
                         "bench_cache", f"bgp_standin_{n}.npz")
    if os.path.exists(cache):
        from pathnet_tpu.data import Graph
        z = np.load(cache)
        g = Graph(n=int(z["n"]), src=z["src"], dst=z["dst"], prob=z["prob"],
                  features=z["x"], labels=z["y"], name="bgp_standin")
    else:
        g = synthetic_graph(n=n, avg_deg=10.0, num_classes=8, homophily=0.37,
                            feat_dim=8, seed=42)
        g = merw_graph(g)
        os.makedirs(os.path.dirname(cache), exist_ok=True)
        np.savez_compressed(cache, n=g.n, src=g.src, dst=g.dst, prob=g.prob,
                            x=g.features, y=g.labels)
    print(f"# setup graph+merw: {time.time() - t0:.1f}s", file=sys.stderr)

    t0 = time.time()
    # defaults: inverse-CDF row-gather sampler + N1/N2 membership distances
    # (both vector formulations — scalar gathers are latency-bound on TPU)
    ps = PathSampler.build(g, num_walks=nw, walk_len=wl, kind="merw")
    print(f"# sampler build: {time.time() - t0:.1f}s", file=sys.stderr)

    import jax.numpy as jnp

    key = jax.random.PRNGKey(0)
    epochs = 50

    # All `epochs` epochs inside one jitted scan — zero dispatch overhead,
    # matching how the training loop consumes the sampler.  A checksum
    # consumes each epoch's tensors so nothing is dead-code-eliminated.
    def many(ps, key):
        def body(acc, e):
            paths, dists = ps.sample_epoch(key, e)
            # full-tensor reduction: a sliced checksum lets XLA dead-code
            # eliminate the whole epoch (observed: "51B paths/s")
            return acc + jnp.sum(paths) + jnp.sum(dists), None
        out, _ = jax.lax.scan(body, jnp.int32(0), jnp.arange(epochs))
        return out

    many = jax.jit(many)
    t0 = time.time()
    cs0 = int(jax.device_get(many(ps, key)))
    print(f"# warmup (compile + {epochs} epochs): {time.time() - t0:.1f}s "
          f"checksum={cs0}", file=sys.stderr)

    # device_get inside the timed region — block_until_ready on scalars has
    # been observed to return early through the experimental tunnel backend
    times = []
    for rep in range(1, 4):
        t0 = time.time()
        cs = int(jax.device_get(many(ps, jax.random.PRNGKey(rep))))
        times.append(time.time() - t0)
        print(f"# rep {rep}: {times[-1]:.2f}s checksum={cs}", file=sys.stderr)
    dt = sorted(times)[1]   # median of 3

    pps = epochs * n * nw / dt
    print(f"# {dt / epochs * 1000:.1f} ms/epoch on {jax.devices()[0]}",
          file=sys.stderr)

    train = bench_training(g, nw, wl)

    print(json.dumps({
        "metric": "bgp_standin_sampled_paths_per_s",
        "value": round(pps),
        "unit": "paths/s",
        "vs_baseline": round(pps / CPU_BASELINE_PATHS_PER_S, 2),
        "sample_ms_per_epoch": round(dt / epochs * 1000, 1),
        **train,
    }))


def bench_training(g, nw, wl):
    """Full PAGG training epoch (sample + microbatched grads + Adam + val
    eval) at bgp-standin scale: ms/epoch, achieved FLOP/s from XLA's cost
    analysis, compile time, and compilation-cache status (VERDICT item 5)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pathnet_tpu.config import TrainConfig
    from pathnet_tpu.data.splits import get_whole_mask
    from pathnet_tpu.models.pagg import PaggSpec, init_pagg_params
    from pathnet_tpu.sample import PathSampler
    from pathnet_tpu.train.trainer import (_pad_chunks, _run_round_scan,
                                           make_optimizer)

    import dataclasses

    hidden, epochs_tr = 64, 3
    spec = PaggSpec(feat_dim=g.features.shape[1], hidden=hidden,
                    out_dim=int(g.labels.max()) + 1, walk_len=wl,
                    variant="hetero")
    cfg = TrainConfig(epochs=epochs_tr, microbatch=8192)
    ps = PathSampler.build(g, num_walks=nw, walk_len=wl, kind="merw")
    X = jnp.asarray(g.features)
    y = jnp.asarray(g.labels)
    num_classes = int(g.labels.max()) + 1
    tr, va, te = get_whole_mask(g.labels, seed=1)
    chunks = [tuple(jnp.asarray(a) for a in
                    _pad_chunks(np.flatnonzero(m), cfg.microbatch))
              for m in (tr, va, te)]
    params = init_pagg_params(jax.random.PRNGKey(0), spec)
    optimizer = make_optimizer(cfg.lr, cfg.weight_decay)
    opt_state = optimizer.init(params)
    args = (params, opt_state, X, y, ps, *chunks, jax.random.PRNGKey(1))

    def measure(sp):
        kw = dict(spec=sp, num_classes=num_classes, epochs=epochs_tr,
                  optimizer=optimizer, track_history=False,
                  microbatch=cfg.microbatch)
        t0 = time.time()
        compiled = _run_round_scan.lower(*args, **kw).compile()
        compile_s = time.time() - t0
        ca = compiled.cost_analysis()
        flops_total = float((ca or {}).get("flops", 0.0))
        jax.block_until_ready(compiled(*args))
        times = []
        for _ in range(2):
            t0 = time.time()
            jax.block_until_ready(compiled(*args))
            times.append(time.time() - t0)
        dt = min(times)
        return dt / epochs_tr * 1000, flops_total / dt if dt else 0.0, compile_s

    # headline = bf16 (the large-protocol default since r4: 25% faster at
    # identical accuracy bands) with the onehot dist-select and mb=8192
    # probe winners (results/grad_probe3.json); f32 kept as the parity row
    ms_bf16, achieved, compile_s = measure(
        dataclasses.replace(spec, compute_dtype="bfloat16"))
    cache_hit = compile_s < 30.0  # persistent-cache hits skip XLA entirely
    ms_f32, achieved_f32, _ = measure(spec)
    # v5e peak: 197 TFLOP/s bf16; f32 matmul ≈ 1/4 of bf16 peak
    mfu = achieved / 197e12
    print(f"# train: compile {compile_s:.1f}s (cache_hit={cache_hit}), "
          f"{ms_bf16:.0f} ms/epoch bf16 / {ms_f32:.0f} ms f32 parity, "
          f"{achieved / 1e12:.2f} TFLOP/s (mfu_bf16 {mfu:.3f})",
          file=sys.stderr)
    return {
        "train_ms_per_epoch": round(ms_bf16, 1),
        "train_dtype": "bfloat16",
        "train_ms_per_epoch_f32": round(ms_f32, 1),
        "train_epochs_per_s": round(1000.0 / ms_bf16, 2) if ms_bf16 else 0,
        "train_achieved_tflops": round(achieved / 1e12, 2),
        "train_mfu_bf16": round(mfu, 3),
        "train_compile_s": round(compile_s, 1),
        "compile_cache_hit": cache_hit,
    }


if __name__ == "__main__":
    main()
