from .compiler import GraphSpec, apply_graph, build_graph, init_graph  # noqa: F401
