"""Shuffle-skew diagnostics — measure before you salt.

`operators/skew.py` holds the cures (salted joins, two-stage distincts);
this module is the diagnosis: which keys are hot, how hot relative to a
uniform spread, and whether any single key exceeds what one reducer of the
configured shuffle can absorb. At 100 TB this report is what decides
between plain AQE skew handling (mild skew) and explicit salting (a key
owning percent-level share); running it costs one partial-aggregated
groupBy over the join column — negligible next to the join it protects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def key_skew_report(
    df: DataFrame,
    key_cols: list[str],
    *,
    top_n: int = 20,
    reducer_share_threshold: float | None = None,
) -> DataFrame:
    """Top-``top_n`` hottest keys with absolute count, share of all rows,
    and ``skew_factor`` = count / (rows / distinct keys) — how many times a
    uniform key's load this key carries. ``hot`` flags keys whose share
    exceeds ``reducer_share_threshold`` (default ``1 / shuffle partitions``:
    the key alone outweighs an average reducer's slice — the regime where
    AQE's skew split stops being enough and salting pays).

    Shape: ONE partial-agged groupBy on the keys; totals are a lazy 1-row
    broadcast (no driver collect); the top-n is a TakeOrdered, not a sort.
    """
    if reducer_share_threshold is None:
        reducer_share_threshold = 1.0 / int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions")
        )
    per_key = df.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows")
    )
    totals = per_key.agg(
        F.sum("n_rows").cast("bigint").alias("_total"),
        F.count(F.lit(1)).cast("bigint").alias("_n_keys"),
    )
    share = F.col("n_rows") / F.col("_total")
    return (
        per_key.crossJoin(F.broadcast(totals))
        .select(
            *key_cols,
            "n_rows",
            F.round(share, 6).alias("share"),
            F.round(
                F.col("n_rows") / (F.col("_total") / F.col("_n_keys")), 2
            ).alias("skew_factor"),
            (share > F.lit(reducer_share_threshold)).alias("hot"),
        )
        .orderBy(F.col("n_rows").desc(), *key_cols)
        .limit(top_n)
    )


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    *,
    exact_distinct: bool = True,
) -> DataFrame:
    """ANALYZE-style per-column statistics — the stats collection every
    engine runs before cost-based decisions, and the first query a user
    points at an unfamiliar table: one row per column with row count,
    null count, distinct count, and lexicographic min/max of the string
    form.

    Shape: the table UNPIVOTS to (column, value string) rows — ``stack``
    is a narrow codegen generator, no Python — then ONE key-partitioned
    aggregation over the column name computes every statistic. One scan,
    one shuffle, regardless of column count.

    ``exact_distinct=False`` swaps count-distinct for
    ``approx_count_distinct`` (HLL) — the 100 TB default, where an exact
    distinct per column is a full shuffle of every value; the exact form
    is the oracle/differential tier. min/max are over the STRING form
    (lexicographic) so every type compares identically cross-engine.
    """
    cols = df.columns if columns is None else columns
    if not cols:
        raise ValueError("profile_table needs at least one column")
    # escape the interpolated identifiers/literals: a column named with a
    # quote or backtick must profile cleanly, not break (or inject into)
    # the stack expression
    pairs = ", ".join(
        "'{lit}', CAST(`{ident}` AS STRING)".format(
            lit=c.replace("\\", "\\\\").replace("'", "\\'"),
            ident=c.replace("`", "``"),
        )
        for c in cols
    )
    from crowdsorsa_etl_spark.operators.fanout import cpu_fanout

    # fanout before the unpivot: a one-split local scan serializes the
    # stack + partial aggregation (incl. the count-distinct partials) on
    # one task — measured 2.8 s of q111's 4.0 s (r16, guide §2.2). The
    # round-robin moves the narrower pre-stack rows and is a no-op at
    # cluster scale.
    stacked = cpu_fanout(df).select(
        F.expr(
            f"stack({len(cols)}, {pairs}) AS (column, value)"
        )
    )
    distinct_agg = (
        F.count_distinct(F.col("value"))
        if exact_distinct
        else F.approx_count_distinct(F.col("value"))
    )
    return (
        stacked.groupBy("column")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(F.when(F.col("value").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_nulls"),
            distinct_agg.cast("bigint").alias("n_distinct"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
    )
