from .trainer import (
    TrainConfig,
    RoundResult,
    make_optimizer,
    run_round,
    run_protocol,
)
from .results import format_result_line, aggregate_rounds
from .inference import predict, evaluate, make_sharded_predict
from .baseline_trainer import run_baseline_round

__all__ = [
    "TrainConfig",
    "RoundResult",
    "make_optimizer",
    "run_round",
    "run_protocol",
    "format_result_line",
    "aggregate_rounds",
    "predict",
    "evaluate",
    "make_sharded_predict",
    "run_baseline_round",
]
