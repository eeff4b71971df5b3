from .cache import enable_compilation_cache
from .timing import Timer

__all__ = ["enable_compilation_cache", "Timer"]
