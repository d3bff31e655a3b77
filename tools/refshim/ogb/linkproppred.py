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


class PygLinkPropPredDataset:  # pragma: no cover - needs a dataset download
    def __init__(self, *args, **kwargs):
        raise NotImplementedError(
            "refshim: PygLinkPropPredDataset requires the real OGB download"
        )
