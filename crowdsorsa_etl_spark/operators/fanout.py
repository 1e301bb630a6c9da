"""Scan-parallelism repair for CPU-bound per-row work (guide §2.2).

Parquet splits align to row groups: a small file (one row group) arrives
as ONE input split regardless of ``maxPartitionBytes``, so any expensive
per-row stage above it — interpreted higher-order functions, Arrow/pandas
UDF batches, JSON rendering, wide partial aggregation — serializes on one
core while the other 31 idle. Measured on the sf0.1 fixtures (event-log
profile, tools/profile_query.py): a 2.6 MB orders scan ran the q111
stack-unpivot profile on 1 task for 2.8 s of a 4.0 s query, and the 0.8 MB
embeddings scan serialized SRP bucketing + k-means assignment the same way.

``cpu_fanout`` round-robins the input up to the session's default
parallelism ONLY when the scan produced fewer splits — on a cluster-scale
input the scan already has >= defaultParallelism splits and this is an
exact no-op; it can never coalesce and never adds a shuffle to a big
input. Result-set semantics are unchanged for order-insensitive plans
(every registered query's comparison contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["cpu_fanout"]


def cpu_fanout(df: DataFrame) -> DataFrame:
    """Round-robin ``df`` up to ``defaultParallelism`` partitions when the
    current plan yields fewer — a no-op at cluster scale (see module doc)."""
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
