"""muller_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the MULLER multimodal data lake
(reference at /root/reference, re-architected Spark-first).

Public API mirrors the reference's surface (dataset CRUD, vectorized
filter/aggregate, query strings, full-text + vector search, version
control, transform pipelines) plus the large-scale training-data
operations (dedup, similarity search, text analysis) the reference's
benchmarks point at.
"""

from muller_spark.session import get_spark
from muller_spark.plans import compile_conditions, compile_query_string
from muller_spark.operators.aggregate import aggregate_vectorized, statistics
from muller_spark.operators.pagination import paginate

__version__ = "0.1.0"

__all__ = [
    "get_spark",
    "compile_conditions",
    "compile_query_string",
    "aggregate_vectorized",
    "statistics",
    "paginate",
]
