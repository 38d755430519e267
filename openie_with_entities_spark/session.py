"""SparkSession factory tuned for the KG-construction pipeline.

Local-mode defaults mirror what we would set on a 1000-executor cluster:
AQE on (runtime re-plan + skew-join splitting at the link/canonicalize
joins), shuffle partitions sized to parallelism, Arrow enabled for the
pandas-UDF stages, UTC session timezone so results compare bit-for-bit
against the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Arrow batch size: the unit of work handed to each mapInPandas stage.
# Big enough to amortize tokenization/model-call overhead, small enough
# that a batch of ≤100-word sentences fits comfortably in worker memory.
ARROW_MAX_RECORDS = 4096


def get_spark(
    app_name: str = "openie_with_entities_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``cores`` defaults to $SPARK_GRAFT_CPUS or all local cores. On a real
    cluster, drop the ``master`` call and submit via spark-submit
    --py-files; every other config carries over unchanged.
    """
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if shuffle_partitions is None:
        # ~2 partitions per core keeps all threads busy through AQE
        # coalescing without over-fragmenting small shuffles.
        shuffle_partitions = max(cores * 2, 8)

    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            str(ARROW_MAX_RECORDS),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    # Local-mode shuffle goes through the local filesystem; with 32
    # concurrent writer threads, disk contention inverts scaling. tmpfs
    # removes the disk from the path (a cluster would use per-node SSDs +
    # the external shuffle service instead).
    if os.path.isdir("/dev/shm") and os.access("/dev/shm", os.W_OK):
        builder = builder.config("spark.local.dir", "/dev/shm/spark-local")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
