"""SparkSession factory for probe_spark.

Local-mode defaults tuned for this sandbox (local[N] on one JVM); on a real
cluster every setting here is overridable via spark-submit conf.  AQE stays
on for runtime re-planning (skew joins, coalesced shuffles).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "probe_spark",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cores = cores or os.environ.get("SPARK_GRAFT_CPUS", "*")
    shuffle = shuffle_partitions or int(
        os.environ.get("PROBE_SPARK_SHUFFLE_PARTITIONS", "32")
    )
    # shuffle spill on tmpfs when available: this sandbox has one slow
    # shared virtio disk whose writeback saturates under parallel shuffle
    # writes (a real cluster has per-executor local disks)
    local_dir = os.environ.get("PROBE_SPARK_LOCAL_DIR")
    if local_dir is None and os.path.isdir("/dev/shm"):
        local_dir = "/dev/shm/spark-local"
    return (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.driver.memory", os.environ.get("PROBE_SPARK_DRIVER_MEM", "32g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.local.dir", local_dir or "/tmp")
        .getOrCreate()
    )
