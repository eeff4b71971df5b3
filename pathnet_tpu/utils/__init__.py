from .cache import enable_compilation_cache
from .platform import force_cpu_devices
from .profiling import trace, Throughput
from .timing import Timer

__all__ = ["enable_compilation_cache", "force_cpu_devices", "Timer",
           "trace", "Throughput"]
