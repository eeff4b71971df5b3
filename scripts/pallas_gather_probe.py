"""Probe: which gather formulations Mosaic supports/performs inside Pallas.

The on-device sampler's hot op is a batched row gather (cdf[cur] for W
walkers).  The north star asks whether a fused Pallas walk-step kernel can
beat the XLA formulation.  This script measures, on the real chip:

1. vector int indexing of a ref (``tbl_ref[idx_ref[:]]``);
2. ``jnp.take(tbl, idx, axis=0)`` in-kernel;
3. same-shape row shuffle via ``take_along_axis(tbl, ids, axis=0)``
   (lowers to ``tpu.dynamic_gather`` over sublanes);
4. lane-wise gather via ``take_along_axis(x, ids, axis=1)``
   (``tpu.dynamic_gather`` over lanes);
5. the XLA baseline row gather for the same shapes.

Each case runs in a subprocess (Mosaic failures can be process-fatal) and
writes ``results/pallas_probe.json``.  Decision history: on jax 0.9 /
v5-lite (axon), cases 1-3 fail to lower or crash Mosaic — arbitrary row
gathers are NOT expressible in-kernel, so the production sampler keeps the
XLA formulation (see README "Pallas decision").

Run: python scripts/pallas_gather_probe.py
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import textwrap

CASES = {
    "int_indexing": """
        def kernel(idx_ref, tbl_ref, out_ref):
            out_ref[:] = tbl_ref[idx_ref[:]]
    """,
    "take": """
        def kernel(idx_ref, tbl_ref, out_ref):
            out_ref[:] = jnp.take(tbl_ref[:], idx_ref[:], axis=0)
    """,
    "row_shuffle_axis0": """
        def kernel(idx_ref, tbl_ref, out_ref):
            ids = jnp.broadcast_to(idx_ref[:][:, None], tbl_ref.shape)
            out_ref[:] = jnp.take_along_axis(tbl_ref[:], ids, axis=0)
    """,
    "lane_gather_axis1": """
        def kernel(idx_ref, tbl_ref, out_ref):
            D = tbl_ref.shape[1]
            ids = jnp.broadcast_to(idx_ref[:][:, None] % D, tbl_ref.shape)
            out_ref[:] = jnp.take_along_axis(tbl_ref[:], ids, axis=1)
    """,
}

RUNNER = """
import sys, time, json
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

n, D = 512, 128
rng = np.random.default_rng(0)
tbl = jnp.asarray(rng.random((n, D)), jnp.float32)
idx = jnp.asarray(rng.integers(0, n, size=n), jnp.int32)

{kernel_src}

f = jax.jit(pl.pallas_call(
    kernel,
    out_shape=jax.ShapeDtypeStruct((n, D), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
              pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
))
t0 = time.time()
c = f.lower(idx, tbl).compile()
out = c(idx, tbl)
jax.block_until_ready(out)
t1 = time.time()
reps = 50
for _ in range(reps):
    out = c(idx, tbl)
jax.block_until_ready(out)
t2 = time.time()
print(json.dumps({{"ok": True, "compile_s": t1 - t0,
                   "steady_us": (t2 - t1) / reps * 1e6}}))
"""

XLA_BASELINE = """
import time, json
import jax
import jax.numpy as jnp
import numpy as np
n, D = 512, 128
rng = np.random.default_rng(0)
tbl = jnp.asarray(rng.random((n, D)), jnp.float32)
idx = jnp.asarray(rng.integers(0, n, size=n), jnp.int32)
f = jax.jit(lambda t, i: t[i])
out = f(tbl, idx); jax.block_until_ready(out)
t1 = time.time()
reps = 50
for _ in range(reps):
    out = f(tbl, idx)
jax.block_until_ready(out)
print(json.dumps({"ok": True, "steady_us": (time.time() - t1) / reps * 1e6}))
"""


def run_case(name: str, src: str, timeout: int = 180) -> dict:
    code = RUNNER.format(kernel_src=textwrap.dedent(src))
    try:
        p = subprocess.run([sys.executable, "-c", code], capture_output=True,
                           text=True, timeout=timeout)
    except subprocess.TimeoutExpired:
        return {"ok": False, "error": "timeout (compile hang)"}
    for line in p.stdout.splitlines():
        if line.startswith("{"):
            return json.loads(line)
    err = (p.stdout + p.stderr).strip().splitlines()
    key = next((l for l in err if "Error" in l or "error" in l
                or "dynamic_gather" in l), err[-1] if err else "unknown")
    return {"ok": False, "error": key[-300:], "returncode": p.returncode}


def main():
    report = {}
    for name, src in CASES.items():
        report[name] = run_case(name, src)
        print(name, "->", report[name])
    p = subprocess.run([sys.executable, "-c", XLA_BASELINE],
                       capture_output=True, text=True, timeout=180)
    for line in p.stdout.splitlines():
        if line.startswith("{"):
            report["xla_row_gather"] = json.loads(line)
    print("xla_row_gather ->", report.get("xla_row_gather"))
    report["decision"] = (
        "keep XLA sampler" if not any(
            v.get("ok") for k, v in report.items()
            if k in ("int_indexing", "take", "row_shuffle_axis0"))
        else "pallas row gather available — benchmark fused walk step")
    os.makedirs("results", exist_ok=True)
    with open("results/pallas_probe.json", "w") as f:
        json.dump(report, f, indent=2)
    print("decision:", report["decision"])


if __name__ == "__main__":
    main()
