"""Minimal torch_geometric stand-in (see tools/refshim/README.md).

Implements only the symbols the reference imports, from public PyG API
semantics, in plain torch. NOT a general PyG replacement.
"""

from . import data  # noqa: F401
from . import datasets  # noqa: F401
from . import nn  # noqa: F401
from . import seed  # noqa: F401
from . import transforms  # noqa: F401
from . import typing  # noqa: F401
from . import utils  # noqa: F401
from .seed import seed_everything  # noqa: F401

__version__ = "0.0.0-refshim"
