from llp_tpu.train.optim import adam_init, adam_update, clip_by_group_norm

__all__ = ["adam_init", "adam_update", "clip_by_group_norm"]
