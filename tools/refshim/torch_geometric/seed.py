import random

import numpy as np
import torch


def seed_everything(seed: int):
    """PyG seed_everything: python / numpy / torch (+cuda) global RNGs."""
    random.seed(seed)
    np.random.seed(seed)
    torch.manual_seed(seed)
    torch.cuda.manual_seed_all(seed)
