"""PyG ``Data``/``Dataset`` stand-ins.

Attributes live directly in ``__dict__`` (the pre-2.0 PyG layout), which is
one of the two layouts ``llp_tpu.data.import_reference._attr`` reads — so
pickles produced by the reference running under this shim are consumable by
the real importer unmodified.
"""

import torch


class Data:
    def __init__(self, x=None, edge_index=None, edge_attr=None, y=None, **kwargs):
        if x is not None:
            self.x = x
        if edge_index is not None:
            self.edge_index = edge_index
        if edge_attr is not None:
            self.edge_attr = edge_attr
        if y is not None:
            self.y = y
        for k, v in kwargs.items():
            setattr(self, k, v)

    # -- PyG-compatible surface used by the reference ----------------------
    @property
    def num_nodes(self):
        x = self.__dict__.get("x")
        if x is not None:
            return x.size(0)
        ei = self.__dict__.get("edge_index")
        if ei is not None and ei.numel():
            return int(ei.max()) + 1
        return None

    @property
    def num_features(self):
        x = self.__dict__.get("x")
        return 0 if x is None else x.size(1)

    def to(self, device, *args, **kwargs):
        for k, v in list(self.__dict__.items()):
            if torch.is_tensor(v):
                self.__dict__[k] = v.to(device)
        return self

    def clone_shallow(self):
        out = Data()
        out.__dict__.update(self.__dict__)
        return out

    def __getattr__(self, name):
        # only called when normal lookup fails; PyG returns None for absent
        # optional payload keys
        if name in ("edge_attr", "edge_weight", "y"):
            return None
        raise AttributeError(name)

    def __repr__(self):
        parts = []
        for k, v in self.__dict__.items():
            if torch.is_tensor(v):
                parts.append(f"{k}={list(v.shape)}")
            else:
                parts.append(f"{k}={v!r}")
        return f"Data({', '.join(parts)})"


class Dataset:
    """Base class: a dataset is a sequence of ``Data`` graphs."""

    def __len__(self):  # pragma: no cover - overridden
        raise NotImplementedError

    def __getitem__(self, idx):  # pragma: no cover - overridden
        raise NotImplementedError
