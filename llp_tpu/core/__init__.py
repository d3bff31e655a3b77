from llp_tpu.core.graph import Graph, build_graph, pad_edges, round_up

__all__ = ["Graph", "build_graph", "pad_edges", "round_up"]
