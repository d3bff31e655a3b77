from . import conv  # noqa: F401
from . import dense  # noqa: F401
from .conv import APPNP, GATConv, GCNConv, MessagePassing, SAGEConv  # noqa: F401
