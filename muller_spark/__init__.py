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


def __getattr__(name):
    # dataset facade functions mirror the reference's top-level API
    # (``muller.load`` / ``muller.empty`` …) but import lazily so
    # ``import muller_spark`` stays cheap for pure-function users.
    # ``dataset`` itself is NOT aliased: the submodule of that name owns
    # the attribute (use ``muller_spark.dataset.dataset`` or ``load``).
    if name in ("load", "empty", "like", "delete"):
        from muller_spark import dataset as _ds_mod

        return getattr(_ds_mod, name)
    if name == "register_fs":
        from muller_spark.fs import register_fs

        return register_fs
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


__version__ = "0.2.0"

__all__ = [
    "get_spark",
    "compile_conditions",
    "compile_query_string",
    "aggregate_vectorized",
    "statistics",
    "paginate",
    "load",
    "empty",
    "like",
    "delete",
    "register_fs",
]
