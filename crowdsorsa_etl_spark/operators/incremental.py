"""Incremental aggregate maintenance: mergeable partial states.

The materialized-view trick every warehouse engine ships: keep per-group
partial states (sum / count / min / max) instead of finished numbers, then
absorbing a new batch is `merge(state, partial_state(delta))` — a groupBy
over |groups| + |delta| rows — instead of re-scanning the full history.
This is exactly Spark's own partial-aggregation contract (ObjectHashAggregate
partial → final) lifted to table granularity, which is why only
merge-closed measures appear here: sum/count/min/max merge losslessly, avg
derives at finalize, and a median would NOT (that's what the histogram /
HLL sketches in q66/q47 are for).

Scale shape: `partial_state` is one partial-aggregable shuffle over the
delta only; `merge_states` shuffles |groups| rows per state, independent of
history row count. At 100 TB the state table is millions of rows where the
history is trillions — maintenance cost stops tracking history size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def partial_state(df: DataFrame, keys: list[str], value_col: str) -> DataFrame:
    """Per-key mergeable state (sum/cnt/min/max) of ``value_col``."""
    return df.groupBy(*keys).agg(
        F.sum(value_col).alias("state_sum"),
        F.count(value_col).cast("bigint").alias("state_cnt"),
        F.min(value_col).alias("state_min"),
        F.max(value_col).alias("state_max"),
    )


def merge_states(*states: DataFrame) -> DataFrame:
    """Merge any number of partial states (same schema) into one."""
    if not states:
        raise ValueError("need at least one state")
    merged = states[0]
    for s in states[1:]:
        merged = merged.unionByName(s)
    keys = [c for c in merged.columns if not c.startswith("state_")]
    return merged.groupBy(*keys).agg(
        F.sum("state_sum").alias("state_sum"),
        F.sum("state_cnt").cast("bigint").alias("state_cnt"),
        F.min("state_min").alias("state_min"),
        F.max("state_max").alias("state_max"),
    )


def incremental_join_state(
    delta: DataFrame,
    dim: DataFrame,
    *,
    join_key: str,
    keys: list[str],
    value_col: str,
) -> DataFrame:
    """Append-only delta maintenance of a JOIN-view aggregate: join ONLY the
    delta batch against the dimension, then take its partial state. Correct
    because an inner join distributes over union on the append-only side —
    (F ∪ ΔF) ⋈ D = (F ⋈ D) ∪ (ΔF ⋈ D) — so the maintenance join is
    delta-sized, never history-sized: at 100 TB the nightly batch joins
    millions of rows against the dim while the view covers trillions.
    (Dim UPDATES are out of scope by contract: a changed dim row invalidates
    history and needs the affected groups recomputed — the same restriction
    every warehouse's incremental-MV feature documents.)"""
    return partial_state(delta.join(dim, join_key), keys, value_col)


def finalize(state: DataFrame, *, round_dp: int = 2) -> DataFrame:
    """State → presentation columns (repo rounding conventions:
    ``avg = round(sum, dp) / cnt``, ulp-safe in both engines)."""
    keys = [c for c in state.columns if not c.startswith("state_")]
    return state.select(
        *keys,
        F.round("state_sum", round_dp).alias("total"),
        F.col("state_cnt").alias("n"),
        F.round("state_min", round_dp).alias("vmin"),
        F.round("state_max", round_dp).alias("vmax"),
        (F.round("state_sum", round_dp) / F.col("state_cnt")).alias("vavg"),
    )
