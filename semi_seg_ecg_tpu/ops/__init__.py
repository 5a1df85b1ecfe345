from .interpolate import linear_interpolate  # noqa: F401
from .losses import cross_entropy, soft_cross_entropy  # noqa: F401
