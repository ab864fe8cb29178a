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
        # runtime Bloom-filter joins: data-dependent joins (candidate docs
        # x lengths, fb docs x postings when over the In cap) get a
        # scan-side filter the planner can't know statically — the
        # runtime analog of the driver-side In pushdowns. Opt-in: at the
        # local bench scale (sf0.1) the filter's build cost exceeds the
        # scan savings (A/B: bm25 topk 1.74s off vs 2.21s on), so it is
        # off by default and worth flipping on a real multi-TB cluster
        # where the filtered scan dominates. (Do NOT also enable
        # runtimeFilter.semiJoinReduction: on Spark 4.1.2 it sends simple
        # equi-join queries into a planner error that pyspark's exception
        # converter turns into an infinite py4j loop.)
        .config(
            "spark.sql.optimizer.runtime.bloomFilter.enabled",
            os.environ.get("SPARK_GRAFT_RUNTIME_BLOOM", "false"),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
