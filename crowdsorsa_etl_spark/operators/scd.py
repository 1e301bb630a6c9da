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
    """(key..., tracked..., valid_from, valid_to, version, is_current,
    last_seen_ts).

    ``last_seen_ts`` is the timestamp of the run's LAST raw event (the
    information collapsing would otherwise destroy): exact on a fresh
    build, and the per-key maintenance watermark ``scd2_apply_batch``'s
    late-event guard needs — an event earlier than the current version's
    last_seen_ts could split an already-collapsed run.
    """
    order = [F.col(ts_col).asc()] + [
        F.col(c).asc() for c in (tie_break_cols or [])
    ]
    w = Window.partitionBy(*key_cols).orderBy(*order)

    def changed(c: str) -> Column:
        # null-safe inequality: NULL → value and value → NULL both open a
        # new version; NULL → NULL does not
        return ~F.col(c).eqNullSafe(F.lag(c).over(w))

    # row_number, not lag(ts).isNull(): a NULL timestamp in the log would
    # make the SECOND row's lag NULL too and open a spurious version
    is_change = F.row_number().over(w) == 1  # first event per key
    for c in tracked_cols:
        is_change = is_change | changed(c)

    # the raw event just before this one: at a change row that is the
    # PREVIOUS run's final event — so a version's last_seen_ts is the NEXT
    # version row's _prev_raw (the final version's is the key max). Both
    # extra windows share w's partitioning: still one Exchange.
    w_key = Window.partitionBy(*key_cols)
    marked = (
        changes.withColumn("_chg", is_change)
        .withColumn("_prev_raw", F.lag(ts_col).over(w))
        .withColumn("_key_max", F.max(ts_col).over(w_key))
        .filter(F.col("_chg"))
    )
    return marked.select(
        *key_cols,
        *tracked_cols,
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w).alias("valid_to"),
        F.row_number().over(w).cast("int").alias("version"),
        F.lead(ts_col).over(w).isNull().alias("is_current"),
        F.coalesce(F.lead("_prev_raw").over(w), F.col("_key_max")).alias(
            "last_seen_ts"
        ),
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
    instead of retaining raw events): an event EARLIER than its key's LAST
    SEEN raw event could split a previously collapsed run ("A@t1, A@t3" +
    late "B@t2" must yield A,B,A) — unrecoverable once the t3 event is
    collapsed away. scd2_build therefore records each run's final raw
    timestamp (``last_seen_ts``), and the guard compares against the key's
    max of it — NOT merely the last change point, which would miss exactly
    the run-splitting case. Late events are rejected: ``on_late="error"``
    (default) raises; ``"drop"`` skips them (the watermark-expired branch
    of a streaming pipeline). Events at or after the watermark merge
    correctly, including same-timestamp ties — existing version rows order
    BEFORE batch events at an equal timestamp (source-rank, then original
    version number, ahead of the caller's tie-breaks).

    After an incremental rebuild, ``last_seen_ts`` stays EXACT on the
    current version (what the guard uses) and is best-effort on historical
    versions (their collapsed tails are gone by design).

    Returns the new full versions DataFrame. The table swap uses
    write-to-temp + rename-aside (``sinks/writers._swap_dirs``), so a crash
    mid-write leaves the old or new table recoverable — never neither; a
    plain overwrite would delete the only copy first and a restart would
    silently rebuild history from one batch.
    """
    if on_late not in {"error", "drop"}:
        raise ValueError(f"on_late must be 'error' or 'drop', got {on_late!r}")
    from crowdsorsa_etl_spark.sinks.writers import _swap_dirs

    ties = list(tie_break_cols or [])
    events = batch.select(*key_cols, ts_col, *tracked_cols, *ties)

    jvm = spark._jvm
    jvm_path = jvm.org.apache.hadoop.fs.Path(versions_dir)
    fs = jvm_path.getFileSystem(spark._jsc.hadoopConfiguration())
    build_kw = dict(
        key_cols=key_cols, ts_col=ts_col, tracked_cols=tracked_cols
    )
    if not fs.exists(jvm_path):
        out = scd2_build(events, tie_break_cols=ties, **build_kw).localCheckpoint()
        out.write.mode("overwrite").parquet(versions_dir)
        return out

    versions = spark.read.parquet(versions_dir)
    affected = events.select(*key_cols).distinct()
    untouched = versions.join(affected, key_cols, "left_anti")
    current = versions.join(affected, key_cols, "left_semi")

    # watermark = last SEEN raw event per key (not max valid_from — see
    # docstring): anything earlier could split a collapsed run
    last = current.groupBy(*key_cols).agg(F.max("last_seen_ts").alias("_last"))
    with_last = events.join(F.broadcast(last), key_cols, "left")
    is_late = F.col("_last").isNotNull() & (F.col(ts_col) < F.col("_last"))
    if on_late == "error":  # "drop" never pays the extra count job
        n_late = with_last.filter(is_late).count()
        if n_late:
            raise ValueError(
                f"{n_late} batch event(s) precede their key's last seen "
                "event; a collapsed SCD2 table cannot replay run splits — "
                "feed late data through a raw-log rebuild, or pass "
                "on_late='drop' for watermark-expired events"
            )
    ok = with_last.filter(~is_late | F.col("_last").isNull()).drop("_last")

    # existing versions replayed as events. Tie order at an equal timestamp:
    # source-rank 0 puts prior rows before batch events, and the original
    # version number keeps SAME-TIMESTAMP prior versions in their original
    # order (NULL-only tie-breaks would re-collapse them nondeterministically)
    tie_types = dict(events.dtypes)
    prior = current.select(
        *key_cols,
        F.col("valid_from").alias(ts_col),
        *tracked_cols,
        F.lit(0).alias("_src"),
        F.col("version").alias("_vord"),
        *[F.lit(None).cast(tie_types[c]).alias(c) for c in ties],
    )
    merged = prior.unionByName(
        ok.withColumn("_src", F.lit(1))
        .withColumn("_vord", F.lit(None).cast("int"))
        .select(prior.columns)
    )
    rebuilt = scd2_build(
        merged, tie_break_cols=["_src", "_vord", *ties], **build_kw
    )
    out = untouched.unionByName(rebuilt).localCheckpoint()  # cut read lineage
    tmp = versions_dir.rstrip("/") + "__scd2_tmp"
    out.write.mode("overwrite").parquet(tmp)
    _swap_dirs(jvm, fs, versions_dir, tmp)
    return out
