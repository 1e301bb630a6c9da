"""File-level data-skipping index: per-file min/max zone maps + pruning.

What Iceberg/Delta manifests and parquet row-group stats do, lifted to an
explicit, queryable table: one row per data file with min/max/count for the
clustered columns. Works hand-in-hand with ``operators/zorder.py`` — after a
Z-order (or range-sort) write, per-file ranges are tight, so a point/range
predicate intersects few files and the scan lists only those.

Scale shape: ``collect_file_stats`` is one partial-aggregable groupBy on
``_metadata.file_path`` (the stats scan itself is column-pruned to the
indexed columns); the stats table has |files| rows — kilobytes per terabyte
— so ``prune_files`` evaluates driver-free as a plain filter, and the
pruned file list feeds ``spark.read.parquet(*files)`` directly. At 100 TB
this is the difference between listing 2 files and scanning 20,000.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def collect_file_stats(
    spark: SparkSession, path: str, cols: list[str]
) -> DataFrame:
    """Per-file zone maps: (file_path, n_rows, <c>_min, <c>_max per col)."""
    df = spark.read.parquet(path).select(
        F.col("_metadata.file_path").alias("file_path"), *cols
    )
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n_rows")]
    for c in cols:
        aggs += [F.min(c).alias(f"{c}_min"), F.max(c).alias(f"{c}_max")]
    return df.groupBy("file_path").agg(*aggs)


def prune_files(
    stats: DataFrame, predicates: dict[str, tuple]
) -> DataFrame:
    """Files whose zone maps intersect every ``col: (lo, hi)`` range
    (inclusive; None = unbounded on that side). Sound, not complete: a
    surviving file MAY contain matches, a pruned file CANNOT."""
    cond = F.lit(True)
    for c, (lo, hi) in predicates.items():
        if lo is not None:
            cond = cond & (F.col(f"{c}_max") >= F.lit(lo))
        if hi is not None:
            cond = cond & (F.col(f"{c}_min") <= F.lit(hi))
    return stats.filter(cond)


def read_pruned(
    spark: SparkSession,
    stats: DataFrame,
    predicates: dict[str, tuple],
) -> DataFrame:
    """Scan only the files surviving zone-map pruning, then re-apply the
    exact predicate (zone maps are file-granular, rows still need the
    filter). The file list is |files|-bounded — a driver-side list of
    paths, the same thing a table format's planner materializes."""
    files = [
        r["file_path"] for r in prune_files(stats, predicates).collect()
    ]
    cond = F.lit(bool(files))
    for c, (lo, hi) in predicates.items():
        if lo is not None:
            cond = cond & (F.col(c) >= F.lit(lo))
        if hi is not None:
            cond = cond & (F.col(c) <= F.lit(hi))
    if not files:  # keep the schema, scan nothing (filter folds to false)
        files = [r["file_path"] for r in stats.select("file_path").collect()]
    if not files:  # stats table itself is empty — no data files at all
        raise ValueError(
            "zone-map stats table lists no data files; build the index "
            "with collect_file_stats() over a non-empty layout first"
        )
    return spark.read.parquet(*files).filter(cond)
