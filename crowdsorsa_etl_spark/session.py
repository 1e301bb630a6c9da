"""SparkSession factory.

Local defaults target the test harness (``local[N]``, one JVM); every knob
is overridable so the same entry points run unchanged on a real cluster.

Scale rationale:
* ``spark.sql.adaptive.*`` — AQE re-plans joins at runtime (broadcast
  conversion, skew-join splitting, post-shuffle partition coalescing);
  essential at 100 TB where static estimates are wrong.
* ``spark.sql.shuffle.partitions`` — sized to cores locally; on a cluster
  this should be ~2-3x total cores (AQE coalesces the excess).
* Arrow enabled so pandas-UDF paths (geometry, embeddings) batch through
  Arrow instead of per-row pickling.
* Session timezone pinned to UTC so timestamp semantics match the DuckDB
  oracle and are cluster-location independent.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(
    app_name: str = "crowdsorsa_etl_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults applied."""
    master = master or f"local[{DEFAULT_CPUS}]"
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or DEFAULT_CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # fixture events.parquet stores INT64 TIMESTAMP(NANOS,false), which
        # Spark has no native type for; read as long and convert at the scan
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
