from muller_spark.versioning.log import CommitLog, Snapshot

__all__ = ["CommitLog", "Snapshot"]
