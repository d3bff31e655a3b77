"""MessagePassing + SAGEConv/GCNConv stand-ins (PyG public semantics).

In the reference's actual runs ``adj_t`` is a plain ``(2, E)`` edge_index
tensor (``src/train_teacher_gnn.py:316-317``), so the gather/scatter
edge-index path below is the one that executes; the SparseTensor fused path
(``message_and_aggregate``) is also dispatched for API completeness because
``SAGEConv_updated`` defines it (``src/sageconv_updated.py:86-89``).

Convention (flow='source_to_target'): ``edge_index[0]`` = source j,
``edge_index[1]`` = target i; aggregation reduces messages at targets.
"""

import torch
import torch.nn.functional as F

from .dense.linear import Linear


def _scatter(src, index, dim_size, reduce):
    """Segment-reduce ``src`` (E, F) rows at ``index`` into (dim_size, F).

    mean divides by in-degree (clamped to 1 → isolated rows stay 0, PyG
    semantics); max fills rows with no messages with 0.
    """
    out = src.new_zeros((dim_size,) + src.shape[1:])
    if reduce in ("add", "sum"):
        return out.index_add_(0, index, src)
    if reduce == "mean":
        out.index_add_(0, index, src)
        count = torch.zeros(dim_size, dtype=src.dtype, device=src.device)
        count.index_add_(0, index, torch.ones_like(index, dtype=src.dtype))
        return out / count.clamp(min=1).view(-1, *([1] * (src.dim() - 1)))
    if reduce == "max":
        out = src.new_full((dim_size,) + src.shape[1:], float("-inf"))
        out.index_reduce_(0, index, src, "amax", include_self=True)
        return out.masked_fill(out == float("-inf"), 0.0)
    raise ValueError(f"unknown reduce {reduce!r}")


class MessagePassing(torch.nn.Module):
    def __init__(self, aggr="add", flow="source_to_target", node_dim=-2, **kwargs):
        super().__init__()
        assert flow == "source_to_target"
        self.aggr = aggr

    def propagate(self, edge_index, x=None, edge_weight=None, size=None):
        if not torch.is_tensor(edge_index):  # SparseTensor fused path
            return self.message_and_aggregate(edge_index, x)
        x_src, x_dst = x if isinstance(x, tuple) else (x, x)
        src, dst = edge_index[0], edge_index[1]
        dim_size = x_dst.size(0) if size is None else size[1]
        msg = self.message(
            x_j=x_src[src],
            **({"edge_weight": edge_weight} if edge_weight is not None else {}),
        )
        return _scatter(msg, dst, dim_size, self.aggr)

    def message(self, x_j, **kwargs):
        return x_j

    def message_and_aggregate(self, adj_t, x):  # pragma: no cover - overridden
        raise NotImplementedError


class SAGEConv(MessagePassing):
    """PyG GraphSAGE: ``lin_l(mean_j x_j) + lin_r(x_i)`` —
    aggregate-then-linear, lin_r without bias."""

    def __init__(
        self,
        in_channels,
        out_channels,
        aggr="mean",
        normalize=False,
        root_weight=True,
        bias=True,
        **kwargs,
    ):
        super().__init__(aggr=aggr, **kwargs)
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.normalize = normalize
        self.root_weight = root_weight
        self.lin_l = Linear(in_channels, out_channels, bias=bias)
        if root_weight:
            self.lin_r = Linear(in_channels, out_channels, bias=False)

    def reset_parameters(self):
        self.lin_l.reset_parameters()
        if self.root_weight:
            self.lin_r.reset_parameters()

    def forward(self, x, edge_index, size=None):
        if torch.is_tensor(x):
            x = (x, x)
        out = self.propagate(edge_index, x=x, size=size)
        out = self.lin_l(out)
        if self.root_weight and x[1] is not None:
            out = out + self.lin_r(x[1])
        if self.normalize:
            out = F.normalize(out, p=2.0, dim=-1)
        return out

    def message_and_aggregate(self, adj_t, x):
        from torch_sparse import matmul

        adj_t = adj_t.set_value(None, layout=None)
        return matmul(adj_t, x[0], reduce=self.aggr)


def gcn_norm(edge_index, edge_weight=None, num_nodes=None, improved=False, add_self_loops=True):
    """Symmetric normalization with self-loops:
    Â = D̂^-1/2 (A + fill·I) D̂^-1/2, fill = 2 if improved else 1."""
    n = int(edge_index.max()) + 1 if num_nodes is None else int(num_nodes)
    fill = 2.0 if improved else 1.0
    if edge_weight is None:
        edge_weight = torch.ones(edge_index.size(1))
    if add_self_loops:
        loops = torch.arange(n, dtype=edge_index.dtype)
        edge_index = torch.cat([edge_index, torch.stack([loops, loops])], dim=-1)
        edge_weight = torch.cat([edge_weight, torch.full((n,), fill)])
    row, col = edge_index[0], edge_index[1]
    deg = torch.zeros(n).index_add_(0, col, edge_weight)
    dinv = deg.pow(-0.5)
    dinv[torch.isinf(dinv)] = 0.0
    return edge_index, dinv[row] * edge_weight * dinv[col]


class GCNConv(MessagePassing):
    """PyG GCN layer: ``Â · lin(x) + bias`` with cached gcn_norm."""

    def __init__(
        self,
        in_channels,
        out_channels,
        improved=False,
        cached=False,
        add_self_loops=True,
        normalize=True,
        bias=True,
        **kwargs,
    ):
        super().__init__(aggr="add", **kwargs)
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.improved = improved
        self.cached = cached
        self.add_self_loops = add_self_loops
        self.normalize_flag = normalize
        self._cache = None
        self.lin = Linear(in_channels, out_channels, bias=False, weight_initializer="glorot")
        self.bias = torch.nn.Parameter(torch.zeros(out_channels)) if bias else None

    def reset_parameters(self):
        self.lin.reset_parameters()
        if self.bias is not None:
            torch.nn.init.zeros_(self.bias)
        self._cache = None

    def forward(self, x, edge_index, edge_weight=None):
        if self.normalize_flag:
            if self._cache is None or not self.cached:
                self._cache = gcn_norm(
                    edge_index,
                    edge_weight,
                    num_nodes=x.size(0),
                    improved=self.improved,
                    add_self_loops=self.add_self_loops,
                )
            edge_index, edge_weight = self._cache
        x = self.lin(x)
        out = self.propagate(edge_index, x=x, edge_weight=edge_weight)
        if self.bias is not None:
            out = out + self.bias
        return out

    def message(self, x_j, edge_weight=None):
        return x_j if edge_weight is None else edge_weight.view(-1, 1) * x_j


class GATConv(torch.nn.Module):  # pragma: no cover - import-surface only
    def __init__(self, *args, **kwargs):
        raise NotImplementedError("refshim: GATConv is import-surface only")


class APPNP(torch.nn.Module):  # pragma: no cover - import-surface only
    def __init__(self, *args, **kwargs):
        raise NotImplementedError("refshim: APPNP is import-surface only")
