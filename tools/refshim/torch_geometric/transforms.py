"""PyG transforms stand-ins: RandomNodeSplit / RandomLinkSplit (the two the
production splitter executes, ``src/generate_production_split.py:50,80``) plus
import-surface classes (NormalizeFeatures, Compose, BaseTransform, ToDevice,
ToSparseTensor)."""

import copy

import torch

from .data import Data
from .utils import add_self_loops, negative_sampling


class BaseTransform:
    def __call__(self, data):  # pragma: no cover - overridden
        raise NotImplementedError

    def __repr__(self):
        return f"{self.__class__.__name__}()"


class Compose(BaseTransform):
    def __init__(self, transforms):
        self.transforms = transforms

    def __call__(self, data):
        for t in self.transforms:
            data = t(data)
        return data


class NormalizeFeatures(BaseTransform):
    def __call__(self, data):
        s = data.x.sum(dim=-1, keepdim=True).clamp(min=1e-12)
        data.x = data.x / s
        return data


class ToDevice(BaseTransform):
    def __init__(self, device):
        self.device = device

    def __call__(self, data):
        return data.to(self.device)


class ToSparseTensor(BaseTransform):
    """Collab-only in the reference; converts edge_index to adj_t."""

    def __call__(self, data):
        from torch_sparse import SparseTensor

        data.adj_t = SparseTensor.from_edge_index(data.edge_index).t()
        data.edge_index = None
        return data


class RandomNodeSplit(BaseTransform):
    """split='train_rest' semantics: round(frac·N) random val/test nodes,
    the rest train; sets boolean ``train_mask``/``val_mask``/``test_mask``."""

    def __init__(self, split="train_rest", num_val=0.1, num_test=0.1):
        self.num_val = num_val
        self.num_test = num_test

    def __call__(self, data):
        n = data.num_nodes
        num_val = round(self.num_val * n) if isinstance(self.num_val, float) else self.num_val
        num_test = round(self.num_test * n) if isinstance(self.num_test, float) else self.num_test
        perm = torch.randperm(n)
        val_mask = torch.zeros(n, dtype=torch.bool)
        test_mask = torch.zeros(n, dtype=torch.bool)
        val_mask[perm[:num_val]] = True
        test_mask[perm[num_val : num_val + num_test]] = True
        data.val_mask = val_mask
        data.test_mask = test_mask
        data.train_mask = ~(val_mask | test_mask)
        return data


class RandomLinkSplit(BaseTransform):
    """PyG 2.x semantics for the single usage in the reference
    (``RandomLinkSplit(0.0, val_ratio, is_undirected=True)``):

    - undirected input: operate on edges with row <= col, shuffled;
      ``int(frac · m)`` val/test counts (floor), rest train;
    - message graphs: train_data/val_data get the symmetrized (concat-flip,
      uncoalesced) TRAIN edges; test_data gets train+val;
    - supervision labels: ``edge_label_index = [pos | neg]`` with
      ``edge_label = [1…1 0…0]``; negatives drawn once for all splits from
      the complement of (full graph ∪ self-loops), allocated
      [val | test | train] in that order, ``neg_sampling_ratio=1``.
    """

    def __init__(
        self,
        num_val=0.1,
        num_test=0.2,
        is_undirected=False,
        add_negative_train_samples=True,
        neg_sampling_ratio=1.0,
    ):
        self.num_val = num_val
        self.num_test = num_test
        self.is_undirected = is_undirected
        self.add_negative_train_samples = add_negative_train_samples
        self.neg_sampling_ratio = neg_sampling_ratio

    def _make(self, data, message_edges, pos_label_edges, neg_edge_index):
        out = copy.copy(data) if not isinstance(data, Data) else data.clone_shallow()
        ei = message_edges
        if self.is_undirected:
            ei = torch.cat([ei, ei.flip([0])], dim=-1)
        out.edge_index = ei
        out.edge_label = torch.cat(
            [
                torch.ones(pos_label_edges.size(1)),
                torch.zeros(neg_edge_index.size(1)),
            ]
        )
        out.edge_label_index = torch.cat([pos_label_edges, neg_edge_index], dim=-1)
        return out

    def __call__(self, data):
        edge_index = data.edge_index
        if self.is_undirected:
            keep = (edge_index[0] <= edge_index[1]).nonzero(as_tuple=False).view(-1)
        else:
            keep = torch.arange(edge_index.size(1))
        keep = keep[torch.randperm(keep.numel())]
        m = keep.numel()
        num_val = int(self.num_val * m) if isinstance(self.num_val, float) else self.num_val
        num_test = int(self.num_test * m) if isinstance(self.num_test, float) else self.num_test
        num_train = m - num_val - num_test

        train_e = edge_index[:, keep[:num_train]]
        val_e = edge_index[:, keep[num_train : num_train + num_val]]
        test_e = edge_index[:, keep[num_train + num_val :]]

        r = self.neg_sampling_ratio
        num_neg_train = int(num_train * r) if self.add_negative_train_samples else 0
        num_neg_val = int(num_val * r)
        num_neg_test = int(num_test * r)
        ei_loops, _ = add_self_loops(edge_index, num_nodes=data.num_nodes)
        neg = negative_sampling(
            ei_loops,
            num_nodes=data.num_nodes,
            num_neg_samples=num_neg_train + num_neg_val + num_neg_test,
        )

        train_data = self._make(
            data, train_e, train_e, neg[:, num_neg_val + num_neg_test :]
        )
        val_data = self._make(data, train_e, val_e, neg[:, :num_neg_val])
        test_data = self._make(
            data,
            torch.cat([train_e, val_e], dim=-1),
            test_e,
            neg[:, num_neg_val : num_neg_val + num_neg_test],
        )
        return train_data, val_data, test_data
