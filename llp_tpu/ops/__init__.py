from llp_tpu.ops.spmm import spmm
from llp_tpu.ops.edge_score import score_edges, hadamard_mlp_score, hadamard_inner_score
from llp_tpu.ops.losses import (
    bce_loss,
    kl_div_loss,
    cosine_loss,
    margin_rank_loss,
    mse_loss,
)
from llp_tpu.ops.metrics import hits_at_k, roc_auc

__all__ = [
    "spmm",
    "score_edges",
    "hadamard_mlp_score",
    "hadamard_inner_score",
    "bce_loss",
    "kl_div_loss",
    "cosine_loss",
    "margin_rank_loss",
    "mse_loss",
    "hits_at_k",
    "roc_auc",
]
