"""CLI — the reference's ``PathNet_run.py`` command surface, TPU-native.

Mirrors the reference flags (PathNet_run.py:44-64) with the same defaults:

    python -m pathnet_tpu.run -data cornell -hid 64 -nw 40 -wl 4 -mk merw

Additions over the reference: ``--model`` selects a baseline from the zoo
(mlp/gcn/gat/...), ``--rnn``/``--agg`` expose the paper's ablations,
``--quirk-compat`` reproduces the reference hetero index quirks,
``--resume`` continues an interrupted multi-round protocol from its
checkpoints.
"""
from __future__ import annotations

import argparse
import sys
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="pathnet_tpu training CLI")
    p.add_argument("-data", "--data_name", type=str, required=True)
    p.add_argument("-lr", "--learning_rate", type=float, default=0.005)
    p.add_argument("-dr", "--dropout", type=float, default=0.7)
    p.add_argument("-e", "--epoch", type=int, default=1000)
    p.add_argument("-wd", "--weight_decay", type=float, default=0.0005)
    p.add_argument("-r", "--round", type=int, default=10)
    p.add_argument("-hid", "--hidden_size", type=int, default=64)
    p.add_argument("-nw", "--num_of_walks", type=int, default=40)
    p.add_argument("-wl", "--walk_length", type=int, default=4)
    p.add_argument("-mk", "--marker", type=str, default="merw",
                   choices=["merw", "uniform"])
    p.add_argument("-pr", "--data_root", type=str, default="data")
    p.add_argument("-mode", "--model_mode", type=str, default="pathnet")
    # reference-command parity (PathNet_run.py:57-63): -nd marks an
    # npy-triple dataset, -ndr points at the directory holding other_data/.
    # Our registry infers both, so -nd is accepted as a no-op and -ndr
    # rebinds the payload root.
    p.add_argument("-nd", "--is_new_data", action="store_true",
                   help="reference-parity flag; payload source is inferred "
                        "from the registry, so this is informational")
    p.add_argument("-ndr", "--new_data_root", type=str, default=None,
                   help="directory containing other_data/<name>/{x,y,"
                        "edge_index}.npy (reference -ndr); overrides "
                        "--data_root for payload lookup")
    p.add_argument("--model", type=str, default="pathnet",
                   help="pathnet or a baseline: mlp/gcn/gat/gatjk/sage/sage1/"
                        "gin/sgc/sgcmem/cheb/fagcn/h2gcn/mixhop/gprgnn/appnp/"
                        "link/gcnjk/lp")
    p.add_argument("--rnn", type=str, default="lstm",
                   choices=["lstm", "gru", "mlp"])
    p.add_argument("--agg", type=str, default="attention",
                   choices=["attention", "mean", "sum"])
    p.add_argument("--quirk-compat", action="store_true")
    p.add_argument("--remat", type=str, default="auto",
                   choices=["auto", "on", "off"],
                   help="rematerialize the encode block under grad: auto "
                        "(off when microbatched; on for large full-batch), "
                        "on, off")
    p.add_argument("--dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"],
                   help="compute dtype for the encode pipeline (bfloat16 "
                        "halves the hot path's HBM traffic; params/head/"
                        "reductions stay f32)")
    p.add_argument("--results-dir", type=str, default="results")
    p.add_argument("--ckpt-dir", type=str, default="saved_models")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--no-scan", action="store_true",
                   help="python epoch loop instead of the on-device scan")
    p.add_argument("--scan-chunk", type=int, default=100,
                   help="epochs per device execution (0 = whole round in "
                        "one scan); bounds single-execution wall time")
    p.add_argument("--microbatch", type=int, default=None,
                   help="nodes per gradient-accumulation chunk (exact math; "
                        "bounds activation memory for 40k+-node graphs)")
    p.add_argument("--mesh", type=int, default=None,
                   help="run the round scan SPMD over an N-device data mesh")
    p.add_argument("--shard-features", action="store_true",
                   help="row-shard X over the mesh (graph-partitioned mode)")
    p.add_argument("--platform", type=str, default=None,
                   help="force a jax platform (e.g. cpu); uses the config "
                        "API because plugins may ignore JAX_PLATFORMS")
    p.add_argument("-c", "--config", type=str, default=None,
                   help="Config JSON file (config.Config.to_json); its values "
                        "become the defaults, explicit CLI flags override")
    return p


def _apply_config_defaults(parser: argparse.ArgumentParser, path: str):
    """Seed parser defaults from a Config JSON (two-phase parse: a flag
    typed on the command line still wins over the file)."""
    from .config import Config

    with open(path) as f:
        c = Config.from_json(f.read())
    parser.set_defaults(
        data_name=c.dataset, data_root=c.data_root,
        learning_rate=c.train.lr, weight_decay=c.train.weight_decay,
        epoch=c.train.epochs, round=c.train.rounds, seed=c.train.seed,
        scan_chunk=c.train.scan_chunk or 0, microbatch=c.train.microbatch,
        hidden_size=c.model.hidden, dropout=c.model.dropout,
        rnn=c.model.rnn, agg=c.model.agg, quirk_compat=c.model.quirk_compat,
        num_of_walks=c.sample.num_walks, walk_length=c.sample.walk_len,
        marker=c.sample.kind,
        mesh=(c.mesh.data_axis * c.mesh.model_axis
              if c.mesh.data_axis * c.mesh.model_axis > 1 else None))
    # -data is required unless the config provides it
    for a in parser._actions:
        if a.dest == "data_name":
            a.required = False


def main(argv=None):
    parser = build_parser()
    av = list(sys.argv[1:] if argv is None else argv)
    for i, tok in enumerate(av):
        if tok in ("-c", "--config") and i + 1 < len(av):
            _apply_config_defaults(parser, av[i + 1])
            break
        if tok.startswith("--config="):
            _apply_config_defaults(parser, tok.split("=", 1)[1])
            break
    args = parser.parse_args(av)
    from .utils import enable_compilation_cache

    enable_compilation_cache()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from .config import TrainConfig
    from .train.results import append_results
    from .train import run_protocol
    from .train.checkpoint import completed_rounds, save_round

    cfg = TrainConfig(lr=args.learning_rate, weight_decay=args.weight_decay,
                      epochs=args.epoch, rounds=args.round, seed=args.seed,
                      scan_epochs=not args.no_scan, microbatch=args.microbatch,
                      scan_chunk=args.scan_chunk or None)
    mesh = None
    if args.mesh:
        from .parallel import make_mesh

        mesh = make_mesh(n_devices=args.mesh)
    name = args.data_name
    if args.new_data_root:
        args.data_root = args.new_data_root
    t0 = time.time()
    print(f"{name}: {vars(args)}")

    if args.model == "pathnet":
        agg, results = run_protocol(
            name, data_root=args.data_root, cfg=cfg,
            num_walks=args.num_of_walks, walk_len=args.walk_length,
            hidden=args.hidden_size, kind=args.marker, rnn=args.rnn,
            agg=args.agg, quirk_compat=args.quirk_compat,
            dropout=args.dropout, mesh=mesh,
            shard_features=args.shard_features,
            compute_dtype=args.dtype, remat=args.remat,
            ckpt_dir=args.ckpt_dir if args.resume else None)
        mode = args.model_mode
    else:
        from .data.registry import DATASETS, load_dataset
        from .models.baselines.zoo import BaselineSpec
        from .train.baseline_trainer import run_baseline_round
        from .train.checkpoint import load_round
        from .train.results import aggregate_rounds
        from .train.trainer import RoundResult

        from .data.registry import payload_fingerprint

        spec_d = DATASETS[name]
        # mirror run_protocol's key: every math-changing knob is in the name
        # so --resume can never bless rounds from a different config
        # (ADVICE r4: a bf16 rerun silently resumed f32 rounds)
        ckpt_name = (f"{name}.{args.model}.{payload_fingerprint(spec_d)}"
                     f".e{args.epoch}.h{args.hidden_size}"
                     f".s{args.seed}.dr{args.dropout}"
                     + ("" if args.dtype == "float32" else f".{args.dtype}"))
        results = []
        for round_i in range(cfg.rounds):
            if args.resume:
                prev = load_round(args.ckpt_dir, ckpt_name, round_i)
                if prev is not None:
                    results.append(RoundResult(
                        best_val_acc=prev["meta"]["best_val_acc"],
                        metrics=prev["meta"]["metrics"]))
                    print(f"round {round_i}: resumed "
                          f"(acc={prev['meta']['metrics']['accuracy']:.4f})")
                    continue
            g, tr, va, te, _ = load_dataset(name, args.data_root, round_i)
            spec = BaselineSpec(name=args.model, feat_dim=g.features.shape[1],
                                hidden=args.hidden_size,
                                out_dim=spec_d.num_classes,
                                dropout=args.dropout,
                                n_nodes=g.n,
                                compute_dtype=args.dtype)
            res = run_baseline_round(g, spec, cfg, tr, va, te,
                                     spec_d.num_classes,
                                     seed=cfg.seed + round_i, mesh=mesh)
            if args.resume:
                save_round(args.ckpt_dir, ckpt_name, round_i, res)
            results.append(res)
            print(f"round {round_i}: acc={results[-1].metrics['accuracy']:.4f}")
        agg = aggregate_rounds(results)
        mode = args.model

    from .data.registry import DATASETS as _DS, payload_fingerprint

    config = dict(vars(args))
    if name in _DS:
        config["payload"] = payload_fingerprint(_DS[name])
    line = append_results(args.results_dir, name, agg, config, mode)
    print(line)
    print(f"total {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
