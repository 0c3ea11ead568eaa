"""SparkSession builder.

Local-mode testing (``local[N]``) with configs that carry over to a real
multi-executor cluster: AQE on (runtime re-plan + skew-join splitting),
Arrow enabled for pandas-UDF exchange, UTC session timezone, shuffle
partitions sized to the parallelism level instead of the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "quant_feature_pipeline_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``cpus`` controls ``local[N]`` parallelism — the bench harness runs the
    identical job at two levels (e.g. 8 and 32) to evidence scaling
    efficiency in lieu of a real two-size cluster.
    """
    n = cpus or DEFAULT_CPUS
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        # 2x overpartition: per-entity groups hash unevenly into exactly-N
        # partitions (Poisson stragglers); AQE coalesces the small ones
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or 2 * n))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # allow joins to co-partition on a SUBSET of the join keys: the
        # engine hash-partitions everything by entity once up front, and
        # every later (entity, ts)-keyed join should reuse that layout.
        # With the default (true), EnsureRequirements re-exchanges BOTH
        # sides on ALL join keys and then re-exchanges the join output
        # back to hash(entity) for the next window — measured on the
        # token pipeline: 5.3 GB of wide-frame shuffle vs 0.9 GB and
        # 30.2 s vs 23.6 s wall at 4x4 executors with this off (r4)
        .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "100000")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", "256m")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
