"""Tiny deterministic synthetic graphs standing in for the PyG datasets.

``utils.get_dataset`` (reference ``src/utils.py:30-50``) maps dataset names
to ``Planetoid``/``Coauthor``/``Amazon`` classes. Offline, each class
generates (once) a small seeded SBM-style graph with community-informative
features and caches it as ``{root}/{llp_name}.npz`` using the SAME
``x``/``edge_index`` keys as ``llp_tpu.data.io.save_dataset_npz`` — so the
llp_tpu side of every golden gate loads the byte-identical graph through its
own registry.
"""

import os
import zlib

import numpy as np
import torch

from .data import Data, Dataset


def _generate_tiny_graph(llp_name: str, n=300, k=4, d=32, p_in=0.10, p_out=0.004):
    """Seeded SBM with community-centroid features (float32, undirected
    coalesced edge_index)."""
    rng = np.random.default_rng(zlib.crc32(llp_name.encode()) & 0x7FFFFFFF)
    comm = rng.integers(0, k, size=n)
    # upper-triangle Bernoulli draws
    iu, ju = np.triu_indices(n, 1)
    p = np.where(comm[iu] == comm[ju], p_in, p_out)
    keep = rng.random(iu.shape[0]) < p
    r, c = iu[keep], ju[keep]
    # guarantee no isolated nodes (link prediction on a tiny graph is noisy
    # enough already): chain any degree-0 node to a same-community buddy.
    # deg updates inside the loop: two isolated same-community nodes that
    # pick each other must not append the pair twice (the coalesce claim
    # below depends on uniqueness).
    deg = np.bincount(np.concatenate([r, c]), minlength=n)
    for v in np.nonzero(deg == 0)[0]:
        if deg[v] > 0:
            continue
        buddies = np.nonzero((comm == comm[v]) & (np.arange(n) != v))[0]
        u = int(buddies[rng.integers(0, buddies.shape[0])])
        r = np.append(r, min(u, v))
        c = np.append(c, max(u, v))
        deg[v] += 1
        deg[u] += 1
    # coalesced symmetric edge_index
    row = np.concatenate([r, c])
    col = np.concatenate([c, r])
    order = np.lexsort((col, row))
    edge_index = np.stack([row[order], col[order]]).astype(np.int64)
    centroids = rng.normal(size=(k, d)).astype(np.float32)
    x = (centroids[comm] + 0.8 * rng.normal(size=(n, d))).astype(np.float32)
    return x, edge_index


class _TinySyntheticDataset(Dataset):
    #: subclass sets {pyg_name_lower: llp_name}
    NAME_MAP = {}
    #: generator overrides; Coauthor/Amazon graphs are bigger/denser so the
    #: 0.1-ratio production split (train_teacher_gnn.py:361-364) has
    #: non-empty new-new test buckets — the REFERENCE crashes on
    #: torch.cat([]) otherwise (test_production:217), a genuine tiny-graph
    #: limitation, not a shim artifact.
    GEN_KW = {}

    def __init__(self, root, name):
        llp_name = self.NAME_MAP[name.lower()]
        os.makedirs(root, exist_ok=True)
        path = os.path.join(root, f"{llp_name}.npz")
        if os.path.exists(path):
            z = np.load(path)
            x, edge_index = z["x"], z["edge_index"]
        else:
            x, edge_index = _generate_tiny_graph(llp_name, **self.GEN_KW)
            np.savez_compressed(path, x=x, edge_index=edge_index)
        self.data = Data(
            x=torch.from_numpy(np.ascontiguousarray(x)),
            edge_index=torch.from_numpy(np.ascontiguousarray(edge_index)),
        )

    def __len__(self):
        return 1

    def __getitem__(self, idx):
        assert idx == 0
        return self.data


class Planetoid(_TinySyntheticDataset):
    NAME_MAP = {"cora": "cora", "citeseer": "citeseer", "pubmed": "pubmed"}


class Coauthor(_TinySyntheticDataset):
    NAME_MAP = {"cs": "coauthor-cs", "physics": "coauthor-physics"}
    GEN_KW = dict(n=450, p_in=0.12, p_out=0.006)


class Amazon(_TinySyntheticDataset):
    NAME_MAP = {"computers": "amazon-computers", "photo": "amazon-photos"}
    GEN_KW = dict(n=450, p_in=0.12, p_out=0.006)
