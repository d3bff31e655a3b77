"""PyG ``torch_geometric.nn.dense.linear.Linear`` stand-in.

Same call/state surface as torch.nn.Linear (weight stored (out, in)), with
PyG's initializer knob: ``weight_initializer=None`` mimics torch's default
(kaiming-uniform a=sqrt(5) + fan-in bias), ``'glorot'`` is xavier-uniform
with zero bias (what GCNConv uses).
"""

import torch


class Linear(torch.nn.Linear):
    def __init__(self, in_channels, out_channels, bias=True, weight_initializer=None):
        self.weight_initializer = weight_initializer
        super().__init__(in_channels, out_channels, bias=bias)

    def reset_parameters(self):
        if getattr(self, "weight_initializer", None) == "glorot":
            torch.nn.init.xavier_uniform_(self.weight)
            if self.bias is not None:
                torch.nn.init.zeros_(self.bias)
        else:
            super().reset_parameters()
