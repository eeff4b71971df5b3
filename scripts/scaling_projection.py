"""ICI-parameterized weak-scaling projection for a real v5e slice (r4).

The virtual-CPU weak-scaling harness (scripts/weak_scaling.py) can only
show the *logical* overhead growth — all 8 virtual devices share one
2-core socket.  This script projects the real-hardware efficiency from
measured single-chip phase times (results/roofline_train.json, real v5e)
plus the analytic per-device communication volume of each exchange mode
(pathnet_tpu/parallel/sparse.py:exchange_comm_words), at v5e ICI link
bandwidth.

Model (weak scaling, per-device load fixed at the bgp-standin bench scale):
  compute_ms(d) = measured single-chip epoch phases (constant per device)
  comm_ms(d)    = words(d) * 4 B / ICI_BW
  efficiency(d) = compute / (compute + comm)

v5e ICI: 4 links x ~45 GB/s usable per direction -> ~180 GB/s aggregate;
we use a conservative single-direction 45 GB/s for the serialized
all-gather path and note the aggregate case.

Writes results/scaling_projection.json and prints the table.
"""
from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

from pathnet_tpu.parallel.sparse import exchange_comm_words  # noqa: E402

# measured single-chip per-epoch phase times at the bench scale
# (results/roofline_train.json, real v5e lite): sample 225 ms, grad 606 ms,
# eval 130 ms -> 961 ms compute per device per epoch at n=64k local nodes
COMPUTE_MS = {"sample": 225.0, "grad": 606.0, "eval": 130.0}
BASE_N = 63977          # per-device nodes (bgp standin)
# the sharded gather table in gather_mode="x" holds RAW feature rows
# (F=287 for the bgp standin) — use that width for the table exchanges;
# the sparse mode ships gathered rows post-projection (H=64)
F = 287
H = 64
NW, WL = 40, 4
ICI_GBPS_CONSERVATIVE = 45.0
ICI_GBPS_AGGREGATE = 180.0


def project(d: int, mode: str, ici_gbps: float) -> dict:
    n_total = BASE_N * d
    m_per_shard = BASE_N * NW * WL          # gather rows issued per device
    width = F if mode in ("gspmd", "ring") else H
    words = exchange_comm_words(n_total, width, m_per_shard, d)[mode]
    # the gather happens twice per epoch (train fwd/bwd gather pair is
    # rematerialized as one stream; eval gathers again) — x2 conservative
    comm_ms = 2 * words * 4 / (ici_gbps * 1e9) * 1e3
    compute_ms = sum(COMPUTE_MS.values())
    eff = compute_ms / (compute_ms + comm_ms)
    return {"devices": d, "mode": mode, "comm_words": int(words),
            "comm_ms": round(comm_ms, 1), "compute_ms": compute_ms,
            "efficiency": round(eff, 3)}


def main():
    out = {"model": "weak scaling, per-device load = bench scale "
                    "(n=63977 local nodes, nw=40, wl=4, H=64); compute "
                    "from results/roofline_train.json (real v5e)",
           "ici_gbps_conservative": ICI_GBPS_CONSERVATIVE,
           "ici_gbps_aggregate": ICI_GBPS_AGGREGATE,
           "points": []}
    print(f"{'d':>3} {'mode':>8} {'comm MB':>9} {'comm ms':>8} "
          f"{'eff@45GB/s':>11} {'eff@180GB/s':>12}")
    for d in (2, 4, 8, 16):
        for mode in ("gspmd", "sparse"):
            p = project(d, mode, ICI_GBPS_CONSERVATIVE)
            p_fast = project(d, mode, ICI_GBPS_AGGREGATE)
            p["efficiency_aggregate"] = p_fast["efficiency"]
            out["points"].append(p)
            print(f"{d:>3} {mode:>8} {p['comm_words']*4/1e6:>9.1f} "
                  f"{p['comm_ms']:>8.1f} {p['efficiency']:>11.3f} "
                  f"{p['efficiency_aggregate']:>12.3f}")
    with open("results/scaling_projection.json", "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
