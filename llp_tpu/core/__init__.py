from llp_tpu.core.graph import Graph, build_graph, round_up

__all__ = ["Graph", "build_graph", "round_up"]
