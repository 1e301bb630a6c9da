"""SCD2 (slowly-changing dimension, type 2) builder from a change log.

The warehouse-side complement of the engine's CDC surface: ``diff.py``
computes what changed between snapshots, ``writers.upsert_parquet`` keeps
latest-per-key, ``snapshots.py`` versions whole tables — this module turns
an append-only change/event log into per-key VERSION HISTORY rows
(valid_from / valid_to validity intervals, is_current flag), the standard
dimension shape for as-of analytics joins (``operators/asof.py`` consumes
exactly this layout).

Semantics: within each key, events order by (ts, tie-break); a new version
opens at the first event and whenever any tracked column differs (null-safe)
from the previous event; valid_to is the next version's valid_from (NULL on
the current version). Consecutive events with unchanged tracked values
collapse into their version — SCD2 records CHANGES, not events.

Scale shape: ONE hash shuffle on the key — the change-detection lag, the
version-numbering row_number, and the valid_to lead all share the same
(key × order) window partitioning, so Catalyst plans a single Exchange +
one sort for the whole operator (plan-asserted in tests).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def scd2_build(
    changes: DataFrame,
    *,
    key_cols: list[str],
    ts_col: str,
    tracked_cols: list[str],
    tie_break_cols: list[str] | None = None,
) -> DataFrame:
    """(key..., tracked..., valid_from, valid_to, version, is_current)."""
    order = [F.col(ts_col).asc()] + [
        F.col(c).asc() for c in (tie_break_cols or [])
    ]
    w = Window.partitionBy(*key_cols).orderBy(*order)

    def changed(c: str) -> Column:
        # null-safe inequality: NULL → value and value → NULL both open a
        # new version; NULL → NULL does not
        return ~F.col(c).eqNullSafe(F.lag(c).over(w))

    is_change = F.lag(ts_col).over(w).isNull()  # first event per key
    for c in tracked_cols:
        is_change = is_change | changed(c)

    marked = changes.withColumn("_chg", is_change).filter(F.col("_chg"))
    # same (ts, tie-break) order as the change-detection window: two change
    # rows in one key can share a timestamp, and version numbering must be
    # deterministic
    wv = Window.partitionBy(*key_cols).orderBy(*order)
    return marked.select(
        *key_cols,
        *tracked_cols,
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(wv).alias("valid_to"),
        F.row_number().over(wv).cast("int").alias("version"),
        F.lead(ts_col).over(wv).isNull().alias("is_current"),
    )
