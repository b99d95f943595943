from muller_spark.index.inverted import InvertedIndex
from muller_spark.index.vector import exact_knn, ann_knn

__all__ = ["InvertedIndex", "exact_knn", "ann_knn"]
