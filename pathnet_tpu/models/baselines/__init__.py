from .ops import spmm, segment_softmax, batch_norm, EdgeGraph
from .zoo import (BASELINES, EXTRA_MODELS, init_baseline, baseline_forward,
                  BaselineSpec, build_baseline_graphs)

__all__ = [
    "batch_norm",
    "build_baseline_graphs",
    "spmm",
    "segment_softmax",
    "EdgeGraph",
    "BASELINES",
    "EXTRA_MODELS",
    "init_baseline",
    "baseline_forward",
    "BaselineSpec",
]
