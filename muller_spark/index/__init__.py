from muller_spark.index.graph import (
    append_graph_vectors,
    build_graph_artifacts,
    graph_search,
)
from muller_spark.index.inverted import InvertedIndex
from muller_spark.index.vector import ann_knn, exact_knn

__all__ = [
    "InvertedIndex", "exact_knn", "ann_knn",
    "build_graph_artifacts", "graph_search", "append_graph_vectors",
]
