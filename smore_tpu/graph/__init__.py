from smore_tpu.graph.graph import Graph  # noqa: F401
