"""SparkSession factory tuned for the engine.

Local testing runs ``local[$SPARK_GRAFT_CPUS]`` (default 32); on a real
cluster the same settings apply minus the ``master`` override.  All knobs
here are chosen for the 100 TB design point:

- AQE on (runtime coalescing, skew-join splitting) so a plan written at
  sf0.01 survives a 1000-executor run unchanged.
- ``spark.sql.shuffle.partitions`` defaults to 32 locally; at cluster
  scale AQE coalesces from a higher initial number, so we expose an env
  override rather than hard-coding.
- Arrow enabled for every pandas-UDF boundary (vector search, tokenizer,
  multimodal decode) — row-at-a-time Python UDFs are banned in this repo.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULTS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.parquet.filterPushdown": "true",
    # events.parquet carries TIMESTAMP(NANOS); read as long + convert
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    "spark.sql.session.timeZone": "UTC",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    "spark.ui.enabled": "false",
    # one BLAS thread per python worker: N concurrent pandas-UDF tasks
    # each spawning an N-thread BLAS pool oversubscribes the box N-fold
    # (measured on the 1M x 960-d IVFPQ encode); task-level parallelism
    # already saturates the cores. Driver-side numpy (k-means training)
    # keeps the full pool — this only reaches executor python workers.
    "spark.executorEnv.OMP_NUM_THREADS": "1",
    "spark.executorEnv.OPENBLAS_NUM_THREADS": "1",
    "spark.executorEnv.MKL_NUM_THREADS": "1",
}


def get_spark(app_name: str = "muller_spark", **extra_conf: str) -> SparkSession:
    """Build (or reuse) the session.  Extra conf overrides defaults."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = SparkSession.builder.appName(app_name).master(f"local[{cpus}]")
    shuffle = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    builder = builder.config("spark.sql.shuffle.partitions", shuffle)
    for key, value in {**_DEFAULTS, **extra_conf}.items():
        builder = builder.config(key, value)
    return builder.getOrCreate()
