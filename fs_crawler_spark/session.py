"""Tuned SparkSession factory.

One place for the physical-execution knobs the engine relies on at scale:
AQE (runtime re-plan + skew-join splitting for hot hosts), Arrow for the
pandas-UDF extraction path, and a shuffle-partition count sized to the
sandbox (local[32]); on a real cluster this is set per-job via spark-submit.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "fs-crawler-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        # 1x cores locally; on a cluster ~2-3x total cores, or rely on AQE
        # coalescing from a higher initial number.
        shuffle_partitions = max(cores, 8)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # pinned (both are the defaults, but load-bearing at the saturated
        # 4N level): worker reuse keeps one long-lived Python proc per slot
        # instead of fork-per-stage churn, and the bounded Arrow batch caps
        # the per-slot pandas working set while a JVM thread + Python worker
        # share each core during extraction stages
        .config("spark.python.worker.reuse", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
