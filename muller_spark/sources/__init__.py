from muller_spark.sources.readers import (
    from_csv,
    from_dataframes,
    from_file,
    read_binary_files,
)
from muller_spark.sources.writers import to_json, to_parquet

__all__ = [
    "from_csv",
    "from_dataframes",
    "from_file",
    "read_binary_files",
    "to_json",
    "to_parquet",
]
