"""Probe: which gather formulations Mosaic supports/performs inside Pallas.

Tests, on the real chip:
1. vector dynamic row-gather from a VMEM-resident table (tbl[idx]);
2. take_along_axis inside a kernel;
3. a fused 3-step walk kernel with tables in VMEM (if 1 works).

Results decide whether the production sampler gets a Pallas fast path.
"""
import sys
import time

sys.path.insert(0, ".")


def main():
    from pathnet_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, D = 63977, 32
    W = 63977 * 40
    rng = np.random.default_rng(0)
    tbl = jnp.asarray(rng.random((n, D)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, n, size=W), jnp.int32)

    # --- 1. vector dynamic row gather in-kernel -------------------------
    def gather_kernel(idx_ref, tbl_ref, out_ref):
        out_ref[:] = tbl_ref[idx_ref[:]]

    try:
        BLK = 2048
        f = pl.pallas_call(
            gather_kernel,
            out_shape=jax.ShapeDtypeStruct((W, D), jnp.float32),
            grid=(W // BLK,),
            in_specs=[
                pl.BlockSpec((BLK,), lambda i: (i,), memory_space=pltpu.VMEM),
                pl.BlockSpec((n, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BLK, D), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        )
        f = jax.jit(f)
        out = f(idx, tbl)
        jax.block_until_ready(out)
        ref = tbl[idx[:64]]
        ok = np.allclose(np.asarray(out[:64]), np.asarray(ref))
        t0 = time.time()
        for _ in range(10):
            out = f(idx, tbl)
        jax.block_until_ready(out)
        print(f"1. pallas row gather: OK correct={ok} "
              f"{(time.time() - t0) / 10 * 1e3:.1f} ms")
    except Exception as e:
        print(f"1. pallas row gather: FAILED {type(e).__name__}: {str(e)[:300]}")

    # --- 2. XLA row gather for comparison -------------------------------
    g = jax.jit(lambda i: tbl[i])
    jax.block_until_ready(g(idx))
    t0 = time.time()
    for _ in range(10):
        out = g(idx)
    jax.block_until_ready(out)
    print(f"2. xla row gather: {(time.time() - t0) / 10 * 1e3:.1f} ms")

    # --- 3. take_along_axis scalar select in-kernel ---------------------
    slots = jnp.asarray(rng.integers(0, D, size=W), jnp.int32)

    def sel_kernel(rows_ref, slot_ref, out_ref):
        rows = rows_ref[:]
        oh = (jax.lax.broadcasted_iota(jnp.int32, rows.shape, 1)
              == slot_ref[:][:, None])
        out_ref[:] = jnp.sum(jnp.where(oh, rows, 0.0), axis=1)

    try:
        BLK = 4096
        rows_all = g(idx)
        f3 = pl.pallas_call(
            sel_kernel,
            out_shape=jax.ShapeDtypeStruct((W,), jnp.float32),
            grid=(W // BLK,),
            in_specs=[
                pl.BlockSpec((BLK, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((BLK,), lambda i: (i,), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BLK,), lambda i: (i,),
                                   memory_space=pltpu.VMEM),
        )
        f3 = jax.jit(f3)
        out3 = f3(rows_all, slots)
        jax.block_until_ready(out3)
        print("3. pallas onehot select: OK")
    except Exception as e:
        print(f"3. pallas onehot select: FAILED {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
