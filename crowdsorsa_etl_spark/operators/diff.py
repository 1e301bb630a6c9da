"""Snapshot diff (CDC-style): classify rows between two table versions.

The reference re-runs its whole pipeline per season and re-POSTs everything
(crowdsorsa-etl-2023.R's script-per-year structure); an engine user instead
wants "what changed since the last snapshot" so downstream sinks ship deltas.
``table_diff`` is that operator: one full-outer join on the key, change
classification as a column expression.

Scale shape: a single co-partitioned SMJ/SHJ on the key columns — both sides
shuffle once on the same key, no broadcast assumption (snapshots are the
same order of magnitude by definition). Compare columns are hashed into one
fingerprint per side BEFORE the join (map-side, no extra shuffle) so wide
rows don't inflate the join payload; at 100 TB pair this with
``sinks/snapshots.py`` versioned reads to diff any two versions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
    *,
    include_unchanged: bool = False,
) -> DataFrame:
    """Rows keyed by ``key_cols`` classified as 'added' / 'removed' /
    'changed' (+ 'unchanged' when requested).

    Output: key columns + ``change_type``. ``compare_cols`` defaults to all
    non-key columns shared by both sides; values are compared null-safely
    via a per-side xxhash64 fingerprint.
    """
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in shared if c not in key_cols]

    def fingerprinted(df: DataFrame, tag: str) -> DataFrame:
        fp = (
            F.xxhash64(*[F.coalesce(F.col(c).cast("string"), F.lit("\0NULL"))
                         for c in compare_cols])
            if compare_cols
            else F.lit(0).cast("bigint")
        )
        return df.select(*key_cols, fp.alias(f"_fp_{tag}"),
                         F.lit(1).alias(f"_present_{tag}"))

    o = fingerprinted(old, "old")
    n = fingerprinted(new, "new")
    joined = o.join(n, on=key_cols, how="full_outer")
    change = (
        F.when(F.col("_present_old").isNull(), F.lit("added"))
        .when(F.col("_present_new").isNull(), F.lit("removed"))
        .when(F.col("_fp_old") != F.col("_fp_new"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out = joined.select(*key_cols, change.alias("change_type"))
    if not include_unchanged:
        out = out.filter(F.col("change_type") != "unchanged")
    return out


def diff_summary(diff: DataFrame) -> DataFrame:
    """Counts per change_type — the one-line CDC report."""
    return diff.groupBy("change_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
