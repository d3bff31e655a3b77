from llp_tpu.sample.negative import (
    edge_hash_keys,
    sample_negative_edges,
    sample_uniform_edges,
)
from llp_tpu.sample.walk import random_walk, sample_contexts

__all__ = [
    "edge_hash_keys",
    "sample_negative_edges",
    "sample_uniform_edges",
    "random_walk",
    "sample_contexts",
]
