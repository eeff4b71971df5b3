from .merw import (
    principal_eigenpair,
    merw_record_probs,
    merw_padded_probs,
    merw_graph,
    stationary_distribution,
    recover_integer_weights,
)

__all__ = [
    "principal_eigenpair",
    "merw_record_probs",
    "merw_padded_probs",
    "merw_graph",
    "stationary_distribution",
    "recover_integer_weights",
]
