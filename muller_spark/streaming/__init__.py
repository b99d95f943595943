from muller_spark.streaming.stateful import (
    sessionize_batch,
    sessionize_stream,
)
from muller_spark.streaming.windows import (
    enrich_stream,
    join_streams,
    stream_from_directory,
    windowed_aggregate,
    write_stream_to_dataset,
)

__all__ = [
    "enrich_stream",
    "join_streams",
    "sessionize_batch",
    "sessionize_stream",
    "stream_from_directory",
    "windowed_aggregate",
    "write_stream_to_dataset",
]
