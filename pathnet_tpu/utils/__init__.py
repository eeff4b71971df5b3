from .cache import enable_compilation_cache
from .profiling import trace, Throughput
from .timing import Timer

__all__ = ["enable_compilation_cache", "Timer", "trace", "Throughput"]
