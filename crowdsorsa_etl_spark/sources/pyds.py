"""Packaged dimensions as a Spark 4 Python DataSource.

The reference ships its municipality key as an R package dataset
(`geofi::municipality_key_2023`, crowdsorsa-etl-2023.R:52). The idiomatic
Spark 4 shape for "a source the engine knows how to produce" is the Python
DataSource API: register once, then ``spark.read.format("crowdsorsa_dim")
.option("name", "municipalities").load()`` — the dim becomes a first-class
planned scan (column pruning applies) instead of a driver-side
``createDataFrame``.

Scale shape: `partitions()` splits the dim so the read parallelizes like
any other source; for these kilobyte dims that's 2 partitions, but the
same reader pattern carries any generator-backed source (an API pager, a
catalog enumeration) where partitioning genuinely matters.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class _Slice(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class _DimReader(DataSourceReader):
    def __init__(self, rows: list[tuple], n_partitions: int = 2):
        self._rows = rows
        self._n = max(1, min(n_partitions, len(rows)))

    def partitions(self):
        step = (len(self._rows) + self._n - 1) // self._n
        return [
            _Slice(i, min(i + step, len(self._rows)))
            for i in range(0, len(self._rows), step)
        ]

    def read(self, partition: _Slice):
        yield from self._rows[partition.start:partition.end]


class CrowdsorsaDimDataSource(DataSource):
    """``spark.read.format("crowdsorsa_dim").option("name", <dim>)`` for
    the packaged dimensions: ``municipalities`` (code, name) and
    ``taxa`` (key, taxon_id, season)."""

    @classmethod
    def name(cls) -> str:
        return "crowdsorsa_dim"

    def schema(self) -> str:
        if self.options.get("name", "municipalities") == "taxa":
            return "taxon string, taxon_id string, season int"
        return "kunta string, municipality_name_fi string"

    def reader(self, schema) -> DataSourceReader:
        from crowdsorsa_etl_spark.sources.observations import (
            MUNICIPALITIES,
            TAXA_2023,
            TAXA_2024,
        )

        which = self.options.get("name", "municipalities")
        if which == "municipalities":
            rows: list[tuple] = list(MUNICIPALITIES)
        elif which == "taxa":
            rows = [(k, v, 2023) for k, v in TAXA_2023.items()] + [
                (k, v, 2024) for k, v in TAXA_2024.items()
            ]
        else:
            raise ValueError(f"unknown dim {which!r}")
        return _DimReader(rows)


# ---------------------------------------------------------------------------
# Custom STREAMING Python DataSource (Spark 4 SimpleDataSourceStreamReader):
# the connector shape for "an upstream system the engine polls" — an API
# pager, a change feed, a queue without a native Spark source. Offsets are
# plain dicts persisted in the checkpoint; readBetweenOffsets() is the
# crash-replay contract (Spark re-reads a committed range after restart, so
# the generator MUST be deterministic per offset range — same discipline as
# a Kafka offset range).
# ---------------------------------------------------------------------------

from pyspark.sql.datasource import SimpleDataSourceStreamReader


def _gen_event(i: int) -> tuple:
    """Deterministic synthetic event for offset i (integer hashing only, no
    RNG state — any executor/replay produces identical rows)."""
    h = (i * 2654435761 + 40503) & 0xFFFFFFFF
    etype = ("view", "click", "purchase")[h % 3]
    return (i, h % 1000, etype, round((h % 10_000) / 100.0, 2))


class _EventStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, rows_per_batch: int, max_rows: int):
        self._per = rows_per_batch
        self._max = max_rows

    def initialOffset(self) -> dict:
        return {"offset": 0}

    def read(self, start: dict):
        s = start["offset"]
        e = min(s + self._per, self._max)
        return iter([_gen_event(i) for i in range(s, e)]), {"offset": e}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter([_gen_event(i) for i in range(start["offset"], end["offset"])])


class CrowdsorsaEventGenDataSource(DataSource):
    """``spark.readStream.format("crowdsorsa_event_gen")`` — a bounded
    deterministic event stream (options: rowsPerBatch, maxRows) exercising
    the custom-streaming-connector path end to end: offsets in the
    checkpoint, exact replay between committed offsets, restart resume."""

    @classmethod
    def name(cls) -> str:
        return "crowdsorsa_event_gen"

    def schema(self) -> str:
        return "event_id long, user_id long, event_type string, value double"

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return _EventStreamReader(
            rows_per_batch=int(self.options.get("rowsPerBatch", 100)),
            max_rows=int(self.options.get("maxRows", 1000)),
        )


def register(spark) -> None:
    spark.dataSource.register(CrowdsorsaDimDataSource)
    spark.dataSource.register(CrowdsorsaEventGenDataSource)
