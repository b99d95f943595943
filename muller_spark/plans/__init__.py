from muller_spark.plans.conditions import compile_conditions
from muller_spark.plans.query_string import compile_query_string

__all__ = ["compile_conditions", "compile_query_string"]
