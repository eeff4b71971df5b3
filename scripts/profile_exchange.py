"""Profile the three boundary-exchange modes on a device mesh.

Times ``gather(h, idx)`` for data-sharded ``h`` under each exchange
implementation (GSPMD all-gather, ppermute ring, ownership-keyed sparse)
across gather sizes spanning the serving -> full-batch regimes, and prints
the measured times next to the analytic communication model
(``parallel/sparse.py:exchange_comm_words``).

On a virtual CPU mesh the absolute times are meaningless (all "devices"
share one socket) but the *relative* scaling with m still tracks the data
volumes each mode moves.  On a real multi-chip slice the same script gives
ICI-true numbers.

Usage: [XLA_FLAGS=--xla_force_host_platform_device_count=8] \
           python scripts/profile_exchange.py [n] [H]
"""
import json
import os
import sys
import time

sys.path.insert(0, ".")

from pathnet_tpu.utils import force_cpu_devices

# the virtual CPU mesh is the point here (relative data volumes); the axon
# plugin ignores JAX_PLATFORMS, so force through the config API pre-init
if "--tpu" not in sys.argv:
    force_cpu_devices(8)
import jax

import jax.numpy as jnp
import numpy as np

from pathnet_tpu.parallel import make_mesh
from pathnet_tpu.parallel.ring import make_ring_gather
from pathnet_tpu.parallel.sparse import (exchange_comm_words,
                                         make_sparse_gather_sharded)


def timeit(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    on_cpu = jax.devices()[0].platform == "cpu"
    n = int(sys.argv[1]) if len(sys.argv) > 1 else (16384 if on_cpu else 65536)
    H = int(sys.argv[2]) if len(sys.argv) > 2 else (32 if on_cpu else 64)
    mesh = make_mesh()
    d = mesh.shape["data"]
    from jax.sharding import NamedSharding, PartitionSpec as P

    h = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(0), (n, H)),
        NamedSharding(mesh, P("data", None)))

    ring = make_ring_gather(mesh, "data")
    sparse = make_sparse_gather_sharded(mesh, "data")
    gspmd = jax.jit(lambda h, i: h[i],
                    out_shardings=NamedSharding(mesh, P("data", None)))

    print(f"# mesh data={d}  h=[{n}, {H}] sharded  (times ms, model kwords"
          f"/device)")
    print(f"{'m_total':>10} {'gspmd':>9} {'ring':>9} {'sparse':>9}"
          f"   | model: ring vs sparse_sharded")
    sizes = (1 << 10, 1 << 13, 1 << 16) if on_cpu else (
        1 << 10, 1 << 13, 1 << 16, 1 << 19, 1 << 22)
    rows = []
    for m in sizes:
        idx = jax.device_put(
            jax.random.randint(jax.random.PRNGKey(m), (m,), 0, n),
            NamedSharding(mesh, P("data")))
        tg = timeit(gspmd, h, idx)
        tr = timeit(lambda h, i: ring(h, i), h, idx)
        ts = timeit(lambda h, i: sparse(h, i), h, idx)
        words = exchange_comm_words(n, H, m // d, d)
        print(f"{m:>10} {tg:>9.3f} {tr:>9.3f} {ts:>9.3f}   | "
              f"{words['ring'] // 1000:>8}k vs {words['sparse_sharded'] // 1000:>8}k")
        rows.append({"m_total": m, "gspmd_ms": round(tg, 3),
                     "ring_ms": round(tr, 3), "sparse_ms": round(ts, 3),
                     "model_ring_words_per_dev": int(words["ring"]),
                     "model_sparse_words_per_dev": int(words["sparse_sharded"])})
    os.makedirs("results", exist_ok=True)
    out = {"devices": d, "n": n, "H": H,
           "platform": jax.devices()[0].platform,
           "note": "virtual CPU mesh times are logic proxies (one socket); "
                   "the m-scaling and the analytic word counts are the "
                   "signal.  Measured: sparse tracks its O(m) model and "
                   "crosses ring's flat O(n*H) volume as m grows — the "
                   "regime table of parallel/sparse.py.",
           "rows": rows}
    with open("results/profile_exchange.json", "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
