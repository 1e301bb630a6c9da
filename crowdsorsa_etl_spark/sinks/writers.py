"""Batch file sinks — the 100 TB-relevant write paths.

The reference's only file sink is a driver-side ``cat`` of pretty JSON
(crowdsorsa-etl-2023.R:228). The engine's canonical sinks:

* ``write_partitioned`` — parquet partitioned by low-cardinality columns
  (e.g. season/date): readers prune whole directories; writes parallelize
  per partition. ``maxRecordsPerFile`` bounds file sizes so a skewed
  partition value can't produce one giant file.
* ``write_bucketed`` — bucketBy on a join key: later joins/aggs on that key
  skip their shuffle entirely (bucket-aware scan). Requires saveAsTable
  (bucket metadata lives in the catalog).
* ``write_json_audit`` — the reference's ``logs{year}.json`` analogue,
  partitioned, no ``coalesce(1)`` (a single-file write serializes the whole
  job through one task at scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_partitioned(
    df: DataFrame,
    path: str,
    *,
    partition_by: list[str],
    mode: str = "overwrite",
    max_records_per_file: int = 5_000_000,
) -> None:
    (
        df.write.mode(mode)
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(*partition_by)
        .parquet(path)
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    bucket_by: list[str],
    num_buckets: int = 32,
    sort_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_by)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.format("parquet").saveAsTable(table)


def write_json_audit(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def epoch_parquet_writer(path: str):
    """Exactly-once parquet delivery for ``writeStream.foreachBatch`` — the
    dependency-free transactional pattern (what Delta's txn log gives you,
    restricted to epoch granularity).

    foreachBatch is at-least-once: after a crash, Structured Streaming
    replays the last unacknowledged epoch. Writing each micro-batch to its
    own ``epoch=<id>`` partition directory with overwrite makes the replay
    IDEMPOTENT — epoch N always lands in the same directory, and a replay
    replaces it with identical content instead of appending duplicates.
    Readers see the union via ordinary partition discovery (the ``epoch``
    partition column doubles as delivery lineage); downstream compaction
    (``compact_parquet``) folds the per-epoch dirs once they go cold.
    """

    def write(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(
            path.rstrip("/") + f"/epoch={epoch_id}"
        )

    return write


def _swap_dirs(jvm, fs, path: str, tmp: str) -> None:
    """Replace ``path`` with the freshly-written ``tmp`` without a window
    in which the data is LOST: rename the current directory aside
    (``path__old``), promote ``tmp``, then delete the old copy. Between the
    two renames there IS a brief window in which ``path`` itself does not
    exist — a concurrent reader can see FileNotFound mid-swap (the data is
    intact under ``path__old``). A crash mid-swap leaves either the old or
    the new table readable (possibly under ``path__old``, recoverable by
    hand) — never neither. For concurrent-reader safety use the manifest
    pointer in ``sinks/snapshots.py`` instead.

    Note: HDFS renames are atomic metadata ops; object stores emulate
    rename as copy+delete, so for S3-class storage a manifest/table
    format (Delta/Iceberg) is the real answer. This helper is the best
    dependency-free approximation: it never deletes the only copy before
    the replacement is in place.
    """
    P = jvm.org.apache.hadoop.fs.Path
    target = P(path)
    old = P(path.rstrip("/") + "__old")
    if fs.exists(old):
        fs.delete(old, True)
    had_prev = fs.exists(target)
    if had_prev and not fs.rename(target, old):
        raise IOError(f"could not move {path} aside to {path}__old")
    if not fs.rename(P(tmp), target):
        # roll back so the table stays readable at its original path
        if had_prev:
            fs.rename(old, target)
        raise IOError(f"could not promote {tmp} to {path}")
    if had_prev:
        fs.delete(old, True)


def compact_parquet(
    spark,
    path: str,
    *,
    target_file_bytes: int = 128 * 1024 * 1024,
    partition_by: list[str] | None = None,
) -> int:
    """Small-files compaction — the operational fix for the classic 100 TB
    failure mode where streaming/incremental writes leave thousands of tiny
    parquet files whose per-file open/footer cost dominates scans.

    Sizes the rewrite from the CURRENT on-disk bytes (Hadoop FS API, no
    driver listing of file contents), repartitions to ceil(bytes/target),
    and swaps via write-to-temp + rename-aside (see ``_swap_dirs`` for the
    crash-window guarantees). Returns the new file-ish partition count.
    """
    import math

    jvm = spark._jvm
    jsc = spark._jsc
    hadoop_path = jvm.org.apache.hadoop.fs.Path(path)
    fs = hadoop_path.getFileSystem(jsc.hadoopConfiguration())
    total_bytes = fs.getContentSummary(hadoop_path).getLength()
    n = max(1, math.ceil(total_bytes / target_file_bytes))

    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + "__compact_tmp"
    writer = df.repartition(n).write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(tmp)

    _swap_dirs(jvm, fs, path, tmp)
    return n


def upsert_parquet(
    spark,
    path: str,
    updates: DataFrame,
    *,
    key_cols: list[str],
    order_col: str,
) -> None:
    """Key-based upsert over a plain parquet table (the engine-level MERGE
    for idempotent re-ingest without a table format): union the current
    table with the updates, keep the row with the greatest ``order_col``
    per key (updates win ties via a source tag), swap via temp +
    rename-aside (``_swap_dirs``).

    One shuffle on the key; rewrite cost is the full table — for
    high-frequency upserts at 100 TB use a table format with file-level
    MERGE (Delta/Iceberg slot in above this same parquet layout); this is
    the dependency-free batch-cadence version.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    jvm = spark._jvm
    hadoop_path = jvm.org.apache.hadoop.fs.Path(path)
    fs = hadoop_path.getFileSystem(spark._jsc.hadoopConfiguration())

    tagged_updates = updates.withColumn("_src", F.lit(1))
    if fs.exists(hadoop_path):
        current = spark.read.parquet(path).withColumn("_src", F.lit(0))
        merged = current.unionByName(tagged_updates)
    else:
        merged = tagged_updates

    w = Window.partitionBy(*key_cols).orderBy(
        F.col(order_col).desc(), F.col("_src").desc()
    )
    result = (
        merged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_src")
    )

    tmp = path.rstrip("/") + "__upsert_tmp"
    result.write.mode("overwrite").parquet(tmp)
    _swap_dirs(jvm, fs, path, tmp)
