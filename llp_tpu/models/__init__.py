from llp_tpu.models.init import init_linear, kaiming_uniform_bound, glorot_uniform
from llp_tpu.models.mlp import init_mlp, apply_mlp
from llp_tpu.models.sage import (
    init_sage_conv,
    apply_sage_conv,
    apply_sage_conv_updated,
    init_sage,
    apply_sage,
)
from llp_tpu.models.gcn import init_gcn_conv, apply_gcn_conv, init_gcn, apply_gcn
from llp_tpu.models.predictor import init_link_predictor, apply_link_predictor

__all__ = [
    "init_linear",
    "kaiming_uniform_bound",
    "glorot_uniform",
    "init_mlp",
    "apply_mlp",
    "init_sage_conv",
    "apply_sage_conv",
    "apply_sage_conv_updated",
    "init_sage",
    "apply_sage",
    "init_gcn_conv",
    "apply_gcn_conv",
    "init_gcn",
    "apply_gcn",
    "init_link_predictor",
    "apply_link_predictor",
]
