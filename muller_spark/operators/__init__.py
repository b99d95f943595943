from muller_spark.operators.aggregate import aggregate_vectorized
from muller_spark.operators.pagination import paginate

__all__ = ["aggregate_vectorized", "paginate"]
