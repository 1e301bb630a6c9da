"""CSV / JSON / binary-file source connectors.

[not in reference] — SURVEY.md §2.2 requires the general source surface.
Schemas are always explicit (``schemas.py`` or caller-supplied): inference
is allowed only via the ``infer`` flag, mirroring the engine-wide rule that
the reference's read-time inference (``sf::st_read``) is opt-in, not default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    *,
    header: bool = True,
    delimiter: str = ",",
    infer: bool = False,
) -> DataFrame:
    if schema is None and not infer:
        raise ValueError("declare a schema or pass infer=True explicitly")
    reader = spark.read.option("header", header).option("delimiter", delimiter)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def read_json(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    *,
    multiline: bool = False,
    infer: bool = False,
) -> DataFrame:
    if schema is None and not infer:
        raise ValueError("declare a schema or pass infer=True explicitly")
    reader = spark.read.option("multiLine", multiline)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_binary_files(
    spark: SparkSession, path: str, *, glob: str | None = None
) -> DataFrame:
    """Whole-file binary source (multimodal payload ingestion): one row per
    file with (path, modificationTime, length, content bytes). The scan
    parallelizes across files; pair with operators/multimodal.py decoders."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def read_orc(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
) -> DataFrame:
    """ORC scan — the columnar alternate to parquet (same pushdown /
    pruning machinery: filters and column selection reach the ORC reader
    as PushedFilters / ReadSchema, vectorized)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def write_orc(df: DataFrame, path: str, *, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)
