from .pagg import init_pagg_params, pagg_forward, PaggSpec

__all__ = ["init_pagg_params", "pagg_forward", "PaggSpec"]
