"""Parquet source connector — the engine's canonical scan.

The reference's scan is ``sf::st_read`` over an unzipped shapefile
(``crowdsorsa-etl-2023.R:28-32``); the engine's canonical columnar source is
parquet so that Catalyst pushes predicates and prunes columns into the scan
(verify with ``df.explain`` → ``PushedFilters`` / ``ReadSchema``).

At 100 TB the same call reads a partitioned directory tree; partition
pruning happens automatically on partition columns in the path.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crowdsorsa_etl_spark.schemas import FIXTURE_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """Read one fixture table. Schemas are declared, never inferred."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    # events.parquet carries INT64 TIMESTAMP(NANOS); Spark refuses it unless
    # nanosAsLong is on. It is a runtime SQL conf, so set it HERE rather than
    # at session build — the read path must work on any externally built
    # SparkSession (e.g. the driver harness), not just our get_spark().
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    # events.ts has shipped as INT64 TIMESTAMP(NANOS) in some fixture builds
    # (read as long nanos via nanosAsLong, truncated to micros) and as naive
    # TIMESTAMP(MICROS) in others (read as TIMESTAMP_NTZ under Spark 4's
    # inferTimestampNTZ default). Normalize both to session-TZ TIMESTAMP:
    # with the session pinned to UTC the NTZ→LTZ cast is epoch-exact, and it
    # matches how DuckDB treats the same naive values (epoch() reads them
    # as-is). Downstream epoch math (unix_micros) requires LTZ.
    for f in df.schema.fields:
        if f.name == "ts" and f.dataType.simpleString() == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        elif f.name == "ts" and f.dataType.simpleString() == "timestamp_ntz":
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    expected = FIXTURE_TABLES.get(name)
    if expected is not None:
        # project to the declared column set (order + pruning); parquet
        # supplies the physical types, which the fixtures already match.
        df = df.select(*[f.name for f in expected.fields])
    return df


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {name: load_table(spark, name, sf_dir) for name in FIXTURE_TABLES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every fixture table as a temp view for the SQL API."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
