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


def scd2_apply_batch(
    spark,
    versions_dir: str,
    batch: DataFrame,
    *,
    key_cols: list[str],
    ts_col: str,
    tracked_cols: list[str],
    tie_break_cols: list[str] | None = None,
    on_late: str = "error",
) -> DataFrame:
    """Incrementally maintain a parquet SCD2 table from change-log batches
    (the ``foreachBatch`` body for streaming CDC ingestion).

    Only the batch's AFFECTED KEYS are touched: their existing versions are
    replayed as a change log (a version row IS its run's opening event),
    unioned with the new events, and re-collapsed with :func:`scd2_build`;
    untouched keys' rows are carried over verbatim. Runs collapse ACROSS
    batches: a batch that continues a key's current value opens no version.

    MONOTONIC-APPEND CONTRACT (the reason this can use collapsed versions
    instead of retaining raw events): an event EARLIER than its key's
    current last change point could split a previously collapsed run
    ("A@t1, A@t3" + late "B@t2" must yield A,B,A) — unrecoverable once the
    t3 event is collapsed away. Such late events are therefore rejected:
    ``on_late="error"`` (default) raises; ``"drop"`` skips them (the
    watermark-expired branch of a streaming pipeline). Events AT or after
    the last change point merge correctly, including same-timestamp ties —
    existing version rows order BEFORE batch events at an equal timestamp
    (a synthesized source-rank tie-break ahead of the caller's).

    Returns the new full versions DataFrame (also written to
    ``versions_dir``, overwrite-atomic like the other sinks).
    """
    if on_late not in {"error", "drop"}:
        raise ValueError(f"on_late must be 'error' or 'drop', got {on_late!r}")
    ties = list(tie_break_cols or [])
    events = batch.select(*key_cols, ts_col, *tracked_cols, *ties)

    jvm_path = spark._jvm.org.apache.hadoop.fs.Path(versions_dir)
    fs = jvm_path.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(jvm_path):
        out = scd2_build(
            events,
            key_cols=key_cols,
            ts_col=ts_col,
            tracked_cols=tracked_cols,
            tie_break_cols=ties,
        ).localCheckpoint()
        out.write.mode("overwrite").parquet(versions_dir)
        return out

    versions = spark.read.parquet(versions_dir)
    affected = events.select(*key_cols).distinct()
    untouched = versions.join(affected, key_cols, "left_anti")
    current = versions.join(affected, key_cols, "left_semi")

    last = current.groupBy(*key_cols).agg(F.max("valid_from").alias("_last"))
    with_last = events.join(F.broadcast(last), key_cols, "left")
    late = with_last.filter(F.col("_last").isNotNull() & (F.col(ts_col) < F.col("_last")))
    n_late = late.count()
    if n_late and on_late == "error":
        raise ValueError(
            f"{n_late} batch event(s) precede their key's last change point; "
            "a collapsed SCD2 table cannot replay run splits — feed late "
            "data through a raw-log rebuild, or pass on_late='drop' for "
            "watermark-expired events"
        )
    ok = with_last.filter(
        F.col("_last").isNull() | (F.col(ts_col) >= F.col("_last"))
    ).drop("_last")

    # existing versions replayed as events; source-rank 0 orders them before
    # batch events (rank 1) at an equal timestamp
    tie_types = dict(events.dtypes)
    prior = current.select(
        *key_cols,
        F.col("valid_from").alias(ts_col),
        *tracked_cols,
        F.lit(0).alias("_src"),
        # NULL tie-breaks (asc-nulls-first) — prior rows have no event id;
        # _src already orders them before any batch event on ties
        *[F.lit(None).cast(tie_types[c]).alias(c) for c in ties],
    )
    merged = prior.unionByName(
        ok.withColumn("_src", F.lit(1)).select(prior.columns)
    )
    rebuilt = scd2_build(
        merged,
        key_cols=key_cols,
        ts_col=ts_col,
        tracked_cols=tracked_cols,
        tie_break_cols=["_src", *ties],
    )
    out = untouched.unionByName(rebuilt).localCheckpoint()  # cut read lineage
    out.write.mode("overwrite").parquet(versions_dir)
    return out
