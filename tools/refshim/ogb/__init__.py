from . import linkproppred  # noqa: F401
