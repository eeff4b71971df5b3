"""Roofline + phase breakdown of the train epoch at bgp-standin scale.

Answers VERDICT r2 item 2a: where does the 1009 ms/epoch go, and how far is
each phase from the v5e bandwidth bound (~819 GB/s HBM) / MXU bound?

Phases measured (each as its own jitted program, median of reps):
  walks            — sample_paths only (CDF walker, no distances)
  dists            — membership_dists only (N1/N2 vector tests)
  sample           — walks + dists (the fused per-epoch sampler)
  fwd              — one training-size forward (microbatch chunked)
  grad             — loss+backward, microbatch-accumulated
  epoch            — full epoch step inside a 1-epoch scan (sample + grad +
                     Adam + val eval + cond test eval) == bench.py's unit

For each phase we report ms, XLA cost-analysis bytes/flops, implied GB/s and
TFLOP/s, and the fraction of the HBM-bandwidth bound achieved.  Optionally
captures a jax.profiler trace of the full epoch (--trace DIR).

Output: JSON to results/roofline_train.json (+ stderr table).
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")

V5E_HBM_GBPS = 819.0
V5E_F32_TFLOPS = 49.2


def timed(compiled, args, reps=5):
    import jax
    jax.block_until_ready(compiled(*args))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        jax.block_until_ready(compiled(*args))
        ts.append(time.time() - t0)
    return sorted(ts)[len(ts) // 2]


def lower_time(f, args):
    t0 = time.time()
    c = f.lower(*args).compile()
    return c, time.time() - t0


def cost(compiled):
    ca = compiled.cost_analysis() or {}
    return float(ca.get("bytes accessed", 0.0)), float(ca.get("flops", 0.0))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", default=None, help="profiler trace dir")
    ap.add_argument("--hidden", type=int, default=64)
    ap.add_argument("--out", default="results/roofline_train.json")
    args = ap.parse_args()

    from pathnet_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pathnet_tpu.config import TrainConfig
    from pathnet_tpu.data import Graph
    from pathnet_tpu.data.splits import get_whole_mask
    from pathnet_tpu.models.pagg import PaggSpec, init_pagg_params
    from pathnet_tpu.sample import PathSampler
    from pathnet_tpu.sample.walk import sample_paths
    from pathnet_tpu.sample.distance import membership_dists
    from pathnet_tpu.train.trainer import (_chunked_grads, _chunked_cm,
                                           _pad_chunks, _run_round_scan,
                                           make_optimizer)

    nw, wl, hidden = 40, 4, args.hidden
    z = np.load("data/bench_cache/bgp_standin_63977.npz")
    g = Graph(n=int(z["n"]), src=z["src"], dst=z["dst"], prob=z["prob"],
              features=z["x"], labels=z["y"], name="bgp_standin")
    n = g.n
    ps = PathSampler.build(g, num_walks=nw, walk_len=wl, kind="merw")
    spec = PaggSpec(feat_dim=g.features.shape[1], hidden=hidden,
                    out_dim=int(g.labels.max()) + 1, walk_len=wl,
                    variant="hetero")
    num_classes = int(g.labels.max()) + 1
    X = jnp.asarray(g.features)
    y = jnp.asarray(g.labels)
    tr, va, te = get_whole_mask(g.labels, seed=1)
    mb = 8192
    chunks = [tuple(jnp.asarray(a) for a in _pad_chunks(np.flatnonzero(m), mb))
              for m in (tr, va, te)]
    params = init_pagg_params(jax.random.PRNGKey(0), spec)
    optimizer = make_optimizer(5e-3, 5e-4)
    opt_state = optimizer.init(params)
    key = jax.random.PRNGKey(1)
    starts = jnp.arange(n, dtype=jnp.int32)

    report = {"n": n, "nw": nw, "wl": wl, "hidden": hidden,
              "microbatch": mb, "phases": {}}

    def add(name, f, fargs, reps=5):
        compiled, comp_s = lower_time(jax.jit(f), fargs)
        dt = timed(compiled, fargs, reps)
        by, fl = cost(compiled)
        row = {"ms": round(dt * 1e3, 2), "compile_s": round(comp_s, 1),
               "bytes_accessed_GB": round(by / 1e9, 3),
               "flops_G": round(fl / 1e9, 2),
               "achieved_GBps": round(by / dt / 1e9, 1) if dt else 0,
               "achieved_TFLOPs": round(fl / dt / 1e12, 3) if dt else 0,
               "pct_of_hbm_bound": round(100 * by / dt / 1e9 / V5E_HBM_GBPS, 1),
               "pct_of_mxu_bound": round(100 * fl / dt / 1e12 / V5E_F32_TFLOPS, 1)}
        report["phases"][name] = row
        print(f"# {name:8s} {row['ms']:9.2f} ms  {row['achieved_GBps']:7.1f} GB/s "
              f"({row['pct_of_hbm_bound']:5.1f}% HBM)  "
              f"{row['achieved_TFLOPs']:6.3f} TFLOP/s "
              f"({row['pct_of_mxu_bound']:4.1f}% MXU)  compile {row['compile_s']:.0f}s",
              file=sys.stderr)
        return compiled

    # -- sampler phases ------------------------------------------------------
    add("walks", lambda k: sample_paths(ps.sampler, k, starts, nw, wl), (key,))
    paths = jax.jit(lambda k: sample_paths(ps.sampler, k, starts, nw, wl))(key)
    paths = jax.block_until_ready(paths)
    add("dists", lambda p: membership_dists(ps.nbr, ps.deg, starts, p), (paths,))
    add("sample", lambda k: ps.sample(k), (key,))

    # -- train phases --------------------------------------------------------
    p_all, d_all = jax.block_until_ready(jax.jit(ps.sample)(key))
    tr_c, tr_w = chunks[0]
    add("grad", lambda pr, p, d: _chunked_grads(
        pr, X, p, d, tr_c, y, tr_w, spec, key), (params, p_all, d_all), reps=3)
    va_c, va_w = chunks[1]
    add("val_cm", lambda pr, p, d: _chunked_cm(
        pr, X, p, d, va_c, y, va_w, spec, num_classes),
        (params, p_all, d_all), reps=3)

    # -- full epoch (the bench unit) -----------------------------------------
    kw = dict(spec=spec, num_classes=num_classes, epochs=1,
              optimizer=optimizer, track_history=False, microbatch=mb)
    eargs = (params, opt_state, X, y, ps, *chunks, key)
    f = lambda *a: _run_round_scan(*a, **kw)
    t0 = time.time()
    compiled = _run_round_scan.lower(*eargs, **kw).compile()
    comp_s = time.time() - t0
    dt = timed(compiled, eargs, reps=3)
    by, fl = cost(compiled)
    report["phases"]["epoch"] = {
        "ms": round(dt * 1e3, 2), "compile_s": round(comp_s, 1),
        "bytes_accessed_GB": round(by / 1e9, 3), "flops_G": round(fl / 1e9, 2),
        "achieved_GBps": round(by / dt / 1e9, 1),
        "achieved_TFLOPs": round(fl / dt / 1e12, 3),
        "pct_of_hbm_bound": round(100 * by / dt / 1e9 / V5E_HBM_GBPS, 1),
        "pct_of_mxu_bound": round(100 * fl / dt / 1e12 / V5E_F32_TFLOPS, 1)}
    print(f"# epoch    {dt*1e3:9.2f} ms  ({by/dt/1e9:.0f} GB/s, "
          f"{100*by/dt/1e9/V5E_HBM_GBPS:.1f}% of HBM bound)", file=sys.stderr)

    if args.trace:
        os.makedirs(args.trace, exist_ok=True)
        with jax.profiler.trace(args.trace):
            jax.block_until_ready(compiled(*eargs))
        report["trace_dir"] = args.trace
        print(f"# trace written to {args.trace}", file=sys.stderr)

    sm = report["phases"]["sample"]["ms"]
    ep = report["phases"]["epoch"]["ms"]
    report["summary"] = {
        "sample_share_of_epoch": round(sm / ep, 3) if ep else None,
        "hbm_bound_ms_for_epoch_bytes": round(
            report["phases"]["epoch"]["bytes_accessed_GB"] / V5E_HBM_GBPS * 1e3, 1),
        "x_from_hbm_bound": round(
            ep / (report["phases"]["epoch"]["bytes_accessed_GB"] / V5E_HBM_GBPS * 1e3), 2),
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as fo:
        json.dump(report, fo, indent=2)
    print(json.dumps(report["summary"]))


if __name__ == "__main__":
    main()
