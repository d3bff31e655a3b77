from . import linear  # noqa: F401
from .linear import Linear  # noqa: F401
