"""Z-order (Morton curve) layout clustering — multi-dimensional data
locality for file-level min/max pruning.

A table queried by ANY of several keys (e.g. ``o_custkey``, ``o_orderdate``,
``o_shippriority``) can only be range-partitioned by one of them; sorting by
the interleaved-bit Z-value keeps rows close in EVERY dimension close in
file order, so parquet row-group min/max statistics prune scans for
predicates on any key. This is what Delta's ``OPTIMIZE ZORDER BY`` and
Iceberg's sort orders do; here it is a pure column expression plus a
range-partitioned write — no table format needed.

The bit-interleave is built from shift/and/or column expressions (JVM-side,
codegen'd); the same loop generates the DuckDB oracle SQL, so engine parity
holds by construction (same pattern as ``_lang_detect_sql``).

n-ary interleave: bit ``i`` of column ``j`` lands at position ``i·n + j``
(round-robin, column 0 lowest), the direct generalization of the classic
2-D Morton code. ``n·bits`` must fit a signed bigint, so the default bit
width per key is ``min(16, 63 // n)`` — 16 for 2-3 keys, 15 for 4.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bits_for(n: int, bits: int | None) -> int:
    if bits is None:
        bits = min(16, 63 // n)
    if n * bits > 63:
        raise ValueError(
            f"{n} keys x {bits} bits = {n * bits} interleaved bits "
            "overflows a signed bigint (max 63)"
        )
    return bits


def z_value_n(cols: Sequence[Column], bits: int | None = None) -> Column:
    """Interleave the low ``bits`` bits of ``n`` non-negative int columns:
    bit i of column j → position i·n + j."""
    n = len(cols)
    bits = _bits_for(n, bits)
    mask = F.lit((1 << bits) - 1)
    masked = [c.cast("bigint").bitwiseAND(mask) for c in cols]
    out = F.lit(0).cast("bigint")
    for i in range(bits):
        for j, c in enumerate(masked):
            out = out.bitwiseOR(
                F.shiftleft(F.shiftright(c, i).bitwiseAND(F.lit(1)), i * n + j)
            )
    return out


def z_value_n_sql(exprs: Sequence[str], bits: int | None = None) -> str:
    """DuckDB SQL for the identical n-ary interleave — generated from the
    same bit loop as :func:`z_value_n`."""
    n = len(exprs)
    bits = _bits_for(n, bits)
    mask = (1 << bits) - 1
    masked = [f"(CAST({e} AS BIGINT) & {mask})" for e in exprs]
    terms = [
        f"((({c} >> {i}) & 1) << {i * n + j})"
        for i in range(bits)
        for j, c in enumerate(masked)
    ]
    return "(" + " | ".join(terms) + ")"


def z_value(x: Column, y: Column, bits: int = 16) -> Column:
    """2-key form (x even bit positions, y odd) — kept as the common case;
    delegates to :func:`z_value_n`."""
    return z_value_n([x, y], bits)


def z_value_sql(x_expr: str, y_expr: str, bits: int = 16) -> str:
    return z_value_n_sql([x_expr, y_expr], bits)


def zorder_write(
    df: DataFrame,
    path: str,
    *cols: str,
    bits: int | None = None,
    num_files: int | None = None,
) -> None:
    """Write ``df`` clustered by Z-value over any number of keys:
    repartitionByRange on the Z-value (one range shuffle — the same cost as
    any global sort-write) then sortWithinPartitions, so every output file
    covers a compact Z-range and its parquet column stats are selective for
    predicates on EVERY interleaved key."""
    if len(cols) < 2:
        raise ValueError("zorder_write needs at least two key columns")
    zed = df.withColumn("_z", z_value_n([F.col(c) for c in cols], bits))
    parts = num_files or df.sparkSession.sparkContext.defaultParallelism
    (
        zed.repartitionByRange(parts, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
