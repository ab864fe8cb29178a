"""SparkSession factory with engine defaults.

Local-mode testing runs on ``local[$SPARK_GRAFT_CPUS]``; on a real cluster the
same configs apply (AQE on, Arrow on, sane shuffle partitioning). The knobs
here are the Spark analogs of Galago's TupleFlow executor settings
(reference: tupleflow/.../execution/JobExecutor.java — thread/fork/cluster
executors; Sorter.java:56-60 — spill fraction).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "galago_git_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession configured for the engine.

    ``cores=None`` uses ``$SPARK_GRAFT_CPUS`` (default 32). Shuffle
    partitions default to the core count: at 100 TB scale you would raise
    this to ~2-4x total executor cores; AQE coalesces small partitions
    either way.
    """
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(cores, 8)
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", "128m")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
