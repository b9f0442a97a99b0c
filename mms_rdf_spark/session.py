"""SparkSession factory tuned for the KG pipeline.

Local-mode settings here are the sandbox proxy for a multi-executor
cluster; the same conf keys apply verbatim under spark-submit on a real
cluster (see pipeline.py). AQE is always on: skew-join splitting and
runtime broadcast promotion are load-bearing for the hot-entity /
long-conversation skew the north rule calls out.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "mms-rdf-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    cores: local parallelism (defaults to $SPARK_GRAFT_CPUS or all).
    shuffle_partitions: defaults to max(cores, 32) — sized so that at
      bench SF each shuffle partition stays well under executor memory;
      AQE coalesces small partitions at runtime so oversizing is cheap.
    """
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    shuffle = shuffle_partitions or max(cores, 32)
    b = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.default.parallelism", str(cores))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        # AQE: coalesce post-shuffle partitions, split skewed joins,
        # demote/promote broadcast at runtime.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow for all pandas UDF / mapInPandas exchanges (the only
        # Python in the hot path, and it is batch-vectorized).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # Small dims (vocabulary, enums) should always broadcast.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
