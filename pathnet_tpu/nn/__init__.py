from .init import (
    torch_linear_init,
    torch_lstm_init,
    xavier_uniform,
    uniform_bound,
)
from .cells import lstm_scan, gru_scan
from .metrics import confusion_matrix, classification_metrics

__all__ = [
    "torch_linear_init",
    "torch_lstm_init",
    "xavier_uniform",
    "uniform_bound",
    "lstm_scan",
    "gru_scan",
    "confusion_matrix",
    "classification_metrics",
]
