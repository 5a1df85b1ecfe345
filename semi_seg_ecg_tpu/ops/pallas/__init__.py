from .flash_attention import flash_attention  # noqa: F401
from .gather1d import (  # noqa: F401
    monotonic_gather, monotonic_gather_int,
)
