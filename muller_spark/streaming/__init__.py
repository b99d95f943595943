from muller_spark.streaming.windows import (
    stream_from_directory,
    windowed_aggregate,
    write_stream_to_dataset,
)

__all__ = [
    "stream_from_directory",
    "windowed_aggregate",
    "write_stream_to_dataset",
]
