"""SparkSession factory with scale-oriented defaults.

Single place that sets the knobs that matter at 100 TB: AQE (runtime
re-planning + skew-join splitting), Arrow for every Python<->JVM exchange,
shuffle partitions sized for the deployment, and broadcast-join thresholds.
On a real cluster the caller overrides master/shuffle partitions via normal
spark-submit conf; these defaults target the local test harness.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULTS = {
    # Runtime re-planning: coalesce post-shuffle partitions, split skewed
    # joins. Essential at scale, harmless locally.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Every pandas UDF exchange goes through Arrow; batch size bounds
    # per-batch memory for wide binary payloads (frames).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "4096",
    # ns-precision parquet timestamps (driver testdata) -> truncate to us.
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    "spark.sql.session.timeZone": "UTC",
    # Keep small-dim joins broadcast (TPC-H dims, gather index lists).
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
}


def get_spark(
    app_name: str = "scanner_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults applied.

    Local test harness: ``local[$SPARK_GRAFT_CPUS]`` with shuffle
    partitions = cpu count.  On a cluster, pass ``master=None`` and let
    spark-submit own the master/resource config.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(_DEFAULTS)
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    # local mode: single JVM gets a large heap from the container
    conf.setdefault("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
