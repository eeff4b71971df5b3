"""Walk-length ablation — the reference's draw_figs/length.py experiment.

Runs the protocol for walk_length in {2,3,4,5} on a dataset and prints the
accuracy table (reference numbers at draw_figs/length.py:49-53).

Usage: python scripts/ablation_length.py cornell [rounds] [epochs]
"""
import sys

sys.path.insert(0, ".")


def main():
    import os

    from pathnet_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    # the axon TPU plugin can ignore JAX_PLATFORMS; force via the config API
    if "--cpu" in sys.argv or os.environ.get("JAX_PLATFORMS") == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
        sys.argv = [a for a in sys.argv if a != "--cpu"]
    from pathnet_tpu.config import TrainConfig
    from pathnet_tpu.train import run_protocol

    name = sys.argv[1] if len(sys.argv) > 1 else "cornell"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    epochs = int(sys.argv[3]) if len(sys.argv) > 3 else 1000
    cfg = TrainConfig(epochs=epochs, rounds=rounds)
    import json
    import time

    import jax

    out_path = f"results/ablation_length_{name}.json"
    from pathnet_tpu.data.registry import DATASETS, payload_fingerprint
    fp = payload_fingerprint(DATASETS[name])
    prev = {}
    if os.path.exists(out_path):
        p = json.load(open(out_path))
        # resume only a run of the same protocol on the same platform and
        # the same payload calibration (stale-artifact guard, VERDICT r3 #5)
        # NOTE: payload must match EXPLICITLY — a legacy artifact without
        # the key must be treated as stale, not blessed (a `.get(..., fp)`
        # default here once re-stamped r4 rows with the r5 fingerprint)
        if (p.get("rounds") == rounds and p.get("epochs") == epochs
                and p.get("platform") == jax.devices()[0].platform
                and p.get("payload") == fp):
            prev = {int(k): v for k, v in p.get("accuracy_by_len", {}).items()}
    rows = [(wl, m, s) for wl, (m, s) in sorted(prev.items())]

    def save():
        os.makedirs("results", exist_ok=True)
        with open(out_path, "w") as f:
            json.dump({"dataset": name, "rounds": rounds, "epochs": epochs,
                       "platform": jax.devices()[0].platform,
                       "payload": fp,
                       "ts": time.time(),
                       "accuracy_by_len": {wl: [m, s] for wl, m, s in rows}},
                      f, indent=2)

    for wl in (2, 3, 4, 5):
        if wl in prev:
            continue
        agg, _ = run_protocol(name, cfg=cfg, walk_len=wl, verbose=False)
        m, s = agg["accuracy"]
        rows.append((wl, m, s))
        print(f"len={wl}: acc {100 * m:.2f} ± {100 * s:.2f}", flush=True)
        save()
    print("\nwalk_len | accuracy")
    for wl, m, s in rows:
        print(f"{wl:8d} | {100 * m:.2f} ± {100 * s:.2f}")

    save()


if __name__ == "__main__":
    main()
