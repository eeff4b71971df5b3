from .trainer import (
    TrainConfig,
    RoundResult,
    make_optimizer,
    run_round,
    run_protocol,
)
from .results import format_result_line, aggregate_rounds

__all__ = [
    "TrainConfig",
    "RoundResult",
    "make_optimizer",
    "run_round",
    "run_protocol",
    "format_result_line",
    "aggregate_rounds",
]
