"""Configuration dataclasses for pathnet_tpu.

Replaces the reference's 15 argparse flags (PathNet_run.py:44-64) and the
hardcoded C++ constants (gen_merw.cpp:2 ``N=100050``, ``:182`` 1000 epochs)
with a single typed config tree.  Everything the reference hardcodes is a
field here.
"""
from __future__ import annotations

import dataclasses
import json
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class SampleConfig:
    """Path-sampling configuration (reference: gen_merw.cpp argv + constants)."""

    num_walks: int = 40          # -nw (PathNet_run.py:53)
    walk_len: int = 4            # -wl (PathNet_run.py:54)
    kind: str = "merw"           # -mk marker: "merw" | "uniform" (gen.cpp vs gen_merw.cpp)
    # uniform mode symmetrizes + adds self loops like gen.cpp:83-94
    add_self_loops: bool = True
    # distance backend (sample/walk.py PathSampler.build): "auto" picks
    # "membership" (N1/N2 row tests, the TPU-fast path) for walk_len <= 4,
    # else "dense" ([n, n] int8 truncated-BFS table); "host" = scipy oracle.
    distance_backend: str = "auto"
    distance_chunk: int = 1024
    # sampler backend: "cdf" = inverse-CDF row gather (measured ~2.7x faster
    # than alias rolls on v5e — walk.py header); "alias" = O(1) Vose rolls.
    sampler: str = "cdf"


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """PAGG model configuration (reference: PathNet_run.py:150-278)."""

    hidden: int = 64             # -hid
    dropout: float = 0.7         # -dr
    variant: str = "auto"        # "hetero" | "homo" | "auto" (dispatch at :286-291)
    rnn: str = "lstm"            # "lstm" | "gru" | "mlp"  (paper ablation rows)
    agg: str = "attention"       # "attention" | "mean" | "sum" (paper ablation rows)
    # Reproduce the reference hetero walk-major mean-misgrouping
    # (PathNet_run.py:196-204, see SURVEY.md §2.4) for golden-value parity.
    quirk_compat: bool = False
    param_dtype: str = "float32"
    compute_dtype: str = "float32"  # bfloat16 supported for large graphs


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training protocol (reference: PathNet_run.py:281-485)."""

    lr: float = 0.005            # -lr
    weight_decay: float = 0.0005  # -wd; torch Adam additive-L2 semantics
    epochs: int = 1000           # -e
    rounds: int = 10             # -r
    seed: int = 0
    # Run the whole epoch loop as one on-device lax.scan (fast path) or as a
    # Python loop of jitted steps (debuggable / large-graph path).
    scan_epochs: bool = True
    # Epochs per device execution: the round scan is issued in chunks of
    # this size (best-on-val carry threaded through; chunked == monolithic
    # exactly).  Bounds single-execution wall time — one multi-minute XLA
    # execution can trip runtime watchdogs on tunneled/preemptible chips —
    # and gives the host a heartbeat between chunks.  None = one shot.
    scan_chunk: Optional[int] = 100
    # Gradient-accumulation chunk size (nodes per microbatch). None = one
    # full-batch shot.  Identical math (grads sum, CE stays a mean over the
    # full mask); bounds activation memory for 64k-node graphs where lane
    # padding inflates small-hidden activations 4x.
    microbatch: Optional[int] = None
    eval_every: int = 1
    checkpoint_dir: Optional[str] = None
    results_dir: Optional[str] = None


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """SPMD mesh layout (no reference counterpart — SURVEY.md §2.7)."""

    data_axis: int = 1           # node/path-partition parallel degree
    model_axis: int = 1          # hidden-dim parallel degree
    axis_names: Tuple[str, str] = ("data", "model")


@dataclasses.dataclass(frozen=True)
class Config:
    dataset: str = "cornell"
    data_root: str = "data"
    sample: SampleConfig = dataclasses.field(default_factory=SampleConfig)
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2, sort_keys=True)

    @staticmethod
    def from_json(s: str) -> "Config":
        d = json.loads(s)
        return Config(
            dataset=d.get("dataset", "cornell"),
            data_root=d.get("data_root", "data"),
            sample=SampleConfig(**d.get("sample", {})),
            model=ModelConfig(**d.get("model", {})),
            train=TrainConfig(**d.get("train", {})),
            mesh=MeshConfig(**{**d.get("mesh", {}),
                               **({"axis_names": tuple(d["mesh"]["axis_names"])}
                                  if "mesh" in d and "axis_names" in d["mesh"] else {})}),
        )
