"""torch_sparse stand-in: ``SparseTensor`` + ``matmul`` (reduce semantics of
torch_sparse.spmm). Only lightly exercised — the reference's live runs pass
plain edge_index tensors (see refshim README) — but implemented correctly:
``matmul(adj_t, x, reduce)`` treats ``adj_t`` rows as targets and columns as
sources: ``out[r] = reduce_{(r,c) ∈ adj_t} value·x[c]``.
"""

import torch


class SparseTensor:
    def __init__(self, row=None, col=None, value=None, sparse_sizes=None):
        self.row_idx = row
        self.col_idx = col
        self.value = value
        if sparse_sizes is None:
            n = int(max(row.max(), col.max())) + 1 if row is not None and row.numel() else 0
            sparse_sizes = (n, n)
        self._sizes = tuple(sparse_sizes)

    @classmethod
    def from_edge_index(cls, edge_index, edge_attr=None, sparse_sizes=None):
        return cls(row=edge_index[0], col=edge_index[1], value=edge_attr, sparse_sizes=sparse_sizes)

    def t(self):
        return SparseTensor(
            row=self.col_idx, col=self.row_idx, value=self.value,
            sparse_sizes=(self._sizes[1], self._sizes[0]),
        )

    def to_symmetric(self):
        row = torch.cat([self.row_idx, self.col_idx])
        col = torch.cat([self.col_idx, self.row_idx])
        n = max(self._sizes)
        key = torch.unique(row * n + col, sorted=True)
        return SparseTensor(row=key // n, col=key % n, value=None, sparse_sizes=(n, n))

    def set_value(self, value, layout=None):
        return SparseTensor(row=self.row_idx, col=self.col_idx, value=value, sparse_sizes=self._sizes)

    def coo(self):
        return self.row_idx, self.col_idx, self.value

    def sizes(self):
        return list(self._sizes)

    def size(self, dim):
        return self._sizes[dim]


def matmul(src: SparseTensor, other: torch.Tensor, reduce: str = "sum"):
    from torch_geometric.nn.conv import _scatter

    msg = other[src.col_idx]
    if src.value is not None:
        msg = src.value.view(-1, 1) * msg
    return _scatter(msg, src.row_idx, src.size(0), reduce)
