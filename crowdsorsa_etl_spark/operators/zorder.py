"""Z-order (Morton curve) layout clustering — multi-dimensional data
locality for file-level min/max pruning.

A table queried by EITHER of two keys (e.g. ``o_custkey`` and
``o_orderdate``) can only be range-partitioned by one of them; sorting by
the interleaved-bit Z-value keeps rows close in BOTH dimensions close in
file order, so parquet row-group min/max statistics prune scans for
predicates on either key. This is what Delta's ``OPTIMIZE ZORDER BY`` and
Iceberg's sort orders do; here it is a pure column expression plus a
range-partitioned write — no table format needed.

The bit-interleave is built from shift/and/or column expressions (JVM-side,
codegen'd); the same loop generates the DuckDB oracle SQL, so engine parity
holds by construction (same pattern as ``_lang_detect_sql``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def z_value(x: Column, y: Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of two non-negative ints: x takes
    even bit positions, y odd. 2×16 bits fits comfortably in a bigint."""
    x = x.cast("bigint").bitwiseAND(F.lit((1 << bits) - 1))
    y = y.cast("bigint").bitwiseAND(F.lit((1 << bits) - 1))
    out = F.lit(0).cast("bigint")
    for i in range(bits):
        out = out.bitwiseOR(
            F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
        )
        out = out.bitwiseOR(
            F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return out


def z_value_sql(x_expr: str, y_expr: str, bits: int = 16) -> str:
    """DuckDB SQL for the identical interleave — generated from the same
    bit loop as :func:`z_value`."""
    mask = (1 << bits) - 1
    xs = f"(CAST({x_expr} AS BIGINT) & {mask})"
    ys = f"(CAST({y_expr} AS BIGINT) & {mask})"
    terms = []
    for i in range(bits):
        terms.append(f"((({xs} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({ys} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(terms) + ")"


def zorder_write(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    bits: int = 16,
    num_files: int | None = None,
) -> None:
    """Write ``df`` clustered by Z-value: repartitionByRange on the Z-value
    (one range shuffle — the same cost as any global sort-write) then
    sortWithinPartitions, so every output file covers a compact Z-range and
    its parquet column stats are selective for BOTH x and y predicates."""
    zed = df.withColumn("_z", z_value(F.col(x_col), F.col(y_col), bits))
    parts = num_files or df.sparkSession.sparkContext.defaultParallelism
    (
        zed.repartitionByRange(parts, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
