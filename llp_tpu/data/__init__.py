from llp_tpu.data.registry import Dataset, get_dataset
from llp_tpu.data.splits import do_edge_split, do_production_edge_split, ProductionSplit
from llp_tpu.data.synthetic import sbm_graph, ba_graph, community_features

__all__ = [
    "Dataset",
    "get_dataset",
    "do_edge_split",
    "do_production_edge_split",
    "ProductionSplit",
    "sbm_graph",
    "ba_graph",
    "community_features",
]
