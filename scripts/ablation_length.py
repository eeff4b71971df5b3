"""Walk-length ablation — the reference's draw_figs/length.py experiment.

Runs the protocol for walk_length in {2,3,4,5} on a dataset and prints the
accuracy table (reference numbers at draw_figs/length.py:49-53).

Usage: python scripts/ablation_length.py cornell [rounds] [epochs]
"""
import sys

sys.path.insert(0, ".")


def main():
    from pathnet_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    from pathnet_tpu.config import TrainConfig
    from pathnet_tpu.train import run_protocol

    name = sys.argv[1] if len(sys.argv) > 1 else "cornell"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    epochs = int(sys.argv[3]) if len(sys.argv) > 3 else 1000
    cfg = TrainConfig(epochs=epochs, rounds=rounds)
    rows = []
    for wl in (2, 3, 4, 5):
        agg, _ = run_protocol(name, cfg=cfg, walk_len=wl, verbose=False)
        m, s = agg["accuracy"]
        rows.append((wl, m, s))
        print(f"len={wl}: acc {100 * m:.2f} ± {100 * s:.2f}")
    print("\nwalk_len | accuracy")
    for wl, m, s in rows:
        print(f"{wl:8d} | {100 * m:.2f} ± {100 * s:.2f}")


if __name__ == "__main__":
    main()
