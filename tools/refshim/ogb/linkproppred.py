"""ogb.linkproppred stand-in: the Evaluator hits@K semantics the reference
drives (``src/train_teacher_gnn.py:119-145``): fraction of positive scores
strictly above the K-th best negative; fewer than K negatives → 1.0 (OGB's
own short-circuit). ``PygLinkPropPredDataset`` (collab download) is
import-surface only offline.
"""

import torch


class Evaluator:
    def __init__(self, name):
        self.name = name
        self.K = 20  # reference overrides per call site (evaluator.K = K)

    def eval(self, input_dict):
        y_pred_pos = input_dict["y_pred_pos"]
        y_pred_neg = input_dict["y_pred_neg"]
        K = self.K
        if y_pred_neg.numel() < K:
            return {f"hits@{K}": 1.0}
        kth = torch.topk(y_pred_neg, K)[0][-1]
        hits = float(torch.sum(y_pred_pos > kth)) / y_pred_pos.numel()
        return {f"hits@{K}": hits}


class PygLinkPropPredDataset:
    """ogbl-collab stand-in with the real dataset's CONSUMPTION contract
    (reference ``src/main.py:306-316``, ``train_teacher_gnn.py:321-331``):

    * ``dataset[0]`` → Data with ``x``, symmetrized-coalesced TRAIN
      ``edge_index`` (held-out valid/test pairs are NOT in the graph) and
      per-direction ``edge_weight`` (collaboration counts, (E, 1) float —
      the reference reshapes it at main.py:310);
    * ``get_edge_split()`` → ``{'train': {'edge', 'weight'}, 'valid':
      {'edge', 'edge_neg'}, 'test': {'edge', 'edge_neg'}}`` with (M, 2)
      single-direction pairs, like OGB's time split.

    The identical graph + split are also exported to ``{root}/collab.npz``
    in the llp_tpu dataset-npz interchange layout (``data/io.py``), so the
    llp_tpu side of golden gates trains on byte-identical inputs through
    its own registry (which routes official splits like the real OGB one).
    """

    def __init__(self, name, root="dataset", transform=None):
        import os
        import zlib

        import numpy as np

        if name != "ogbl-collab":
            raise NotImplementedError(
                f"refshim PygLinkPropPredDataset supports ogbl-collab only, got {name!r}"
            )
        rng = np.random.default_rng(zlib.crc32(b"ogbl-collab") & 0x7FFFFFFF)
        n, k, d = 500, 5, 64
        comm = rng.integers(0, k, size=n)
        iu, ju = np.triu_indices(n, 1)
        p = np.where(comm[iu] == comm[ju], 0.08, 0.003)
        keep = rng.random(iu.shape[0]) < p
        pairs = np.stack([iu[keep], ju[keep]])  # (2, M) unique i<j
        m = pairs.shape[1]
        w_pairs = rng.integers(1, 5, size=m).astype(np.float32)

        perm = rng.permutation(m)
        n_v = n_t = int(0.075 * m)
        n_tr = m - n_v - n_t
        tr, va, te = (
            pairs[:, perm[:n_tr]],
            pairs[:, perm[n_tr : n_tr + n_v]],
            pairs[:, perm[n_tr + n_v :]],
        )
        w_tr = w_pairs[perm[:n_tr]]

        # negatives: uniform non-edge pairs (one direction), shared style
        forbid = set(pairs[0].astype(np.int64) * n + pairs[1])
        negs = []
        while len(negs) < 3 * n_v:
            a, b = rng.integers(0, n, size=2)
            if a == b:
                continue
            key = min(a, b) * n + max(a, b)
            if key in forbid:
                continue
            negs.append((a, b))
        negs = np.asarray(negs, np.int64).T
        va_neg, te_neg = negs[:, : int(1.5 * n_v)], negs[:, int(1.5 * n_v) :]

        # symmetrized, coalesced train message graph + aligned weights
        row = np.concatenate([tr[0], tr[1]])
        col = np.concatenate([tr[1], tr[0]])
        w2 = np.concatenate([w_tr, w_tr])
        order = np.lexsort((col, row))
        edge_index = np.stack([row[order], col[order]]).astype(np.int64)
        edge_weight = w2[order].astype(np.float32)

        centroids = rng.normal(size=(k, d)).astype(np.float32)
        x = (centroids[comm] + 0.8 * rng.normal(size=(n, d))).astype(np.float32)

        self._split = {
            "train": {
                "edge": torch.from_numpy(tr.T.copy()),
                "weight": torch.from_numpy(w_tr.copy()),
            },
            "valid": {
                "edge": torch.from_numpy(va.T.copy()),
                "edge_neg": torch.from_numpy(va_neg.T.copy()),
            },
            "test": {
                "edge": torch.from_numpy(te.T.copy()),
                "edge_neg": torch.from_numpy(te_neg.T.copy()),
            },
        }
        from torch_geometric.data import Data

        self.data = Data(
            x=torch.from_numpy(x),
            edge_index=torch.from_numpy(edge_index),
            edge_weight=torch.from_numpy(edge_weight.reshape(-1, 1).copy()),
        )

        # llp_tpu interchange export (data/io.py::save_dataset_npz layout)
        os.makedirs(root, exist_ok=True)
        arrays = {
            "x": x, "edge_index": edge_index, "edge_weight": edge_weight,
            "split_name": np.asarray("ogb:time(standin)"),
        }
        for part, dd in self._split.items():
            for kk, vv in dd.items():
                arrays[f"split__{part}__{kk}"] = vv.numpy()
        np.savez_compressed(os.path.join(root, "collab.npz"), **arrays)

    @property
    def num_features(self):
        return self.data.x.size(1)

    def get_edge_split(self):
        return self._split

    def __len__(self):
        return 1

    def __getitem__(self, idx):
        assert idx == 0
        return self.data
