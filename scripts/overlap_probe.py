"""Can two independent device programs overlap on the axon TPU backend?

VERDICT r3 weak #4 proposes overlapping epoch e+1's sampling with epoch e's
backward (~180 ms/epoch on the table).  On a single TPU core, XLA executes
one program at a time per core and compute ops within a program are
scheduled sequentially on the same vector/matrix units — overlap only helps
if the runtime can interleave two *executions* (it generally cannot on one
core) or if the two workloads bind different resources.  This probe
measures it directly:

  A = a sampler-like gather-bound program
  B = a matmul-bound program
  serial:      time(A then B, blocking between)
  interleaved: dispatch A and B without blocking, time both

If interleaved ≈ serial, the backend serializes executions and the overlap
line in PERF.md §4.2 is closed as "not available on this backend".

Run: python scripts/overlap_probe.py
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")


def main():
    from pathnet_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print("device:", dev)

    n, rows = 1 << 16, 1 << 21

    @jax.jit
    def gatherish(table, idx, key):
        # 3 dependent row-gather rounds ≈ the walk kernel's access pattern
        acc = jnp.zeros((rows, table.shape[1]), table.dtype)
        for i in range(3):
            idx = (idx * 1103515245 + 12345 + i) % n
            acc = acc + table[idx]
        return acc.sum()          # scalar: array-output .block_until_ready()
        # returns EARLY on the axon backend (measured r4) — all timings here
        # force completion via a scalar host read

    @jax.jit
    def matmulish(x, w):
        for _ in range(8):
            x = jnp.tanh(x @ w)
        return x.sum()

    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (n, 64))
    idx = jax.random.randint(key, (rows,), 0, n)
    x = jax.random.normal(key, (4096, 4096), jnp.bfloat16)
    w = jax.random.normal(key, (4096, 4096), jnp.bfloat16)

    # warmup/compile
    float(gatherish(table, idx, key))
    float(matmulish(x, w))

    def timed(fn, reps=10):
        t0 = time.perf_counter()
        for _ in range(reps):
            fn()
        return (time.perf_counter() - t0) / reps

    tA = timed(lambda: float(gatherish(table, idx, key)))
    tB = timed(lambda: float(matmulish(x, w)))

    def serial():
        float(gatherish(table, idx, key))
        float(matmulish(x, w))

    def interleaved():
        a = gatherish(table, idx, key)     # async dispatch
        b = matmulish(x, w)                # async dispatch
        float(a), float(b)

    tS = timed(serial)
    tI = timed(interleaved)
    overlap_frac = (tS - tI) / min(tA, tB) if min(tA, tB) > 0 else 0.0
    out = {"device": str(dev), "gather_ms": tA * 1e3, "matmul_ms": tB * 1e3,
           "serial_ms": tS * 1e3, "interleaved_ms": tI * 1e3,
           "overlap_fraction_of_smaller": round(float(overlap_frac), 3)}
    print(json.dumps(out, indent=2))
    with open("results/overlap_probe.json", "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
