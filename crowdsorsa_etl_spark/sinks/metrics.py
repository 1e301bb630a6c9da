"""Pipeline observability — ``df.observe`` metric capture.

Accumulator-style metrics ride along with the SAME action that produces the
output (no second scan, no count() doubling the job) — the production
answer to "how many rows/nulls/bad records did this run emit". Works
identically in batch (read after the action) and in streaming
(QueryProgressEvent.observedMetrics).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation


def observed(df: DataFrame, name: str, *metrics: Column) -> tuple[DataFrame, Observation]:
    """Attach named aggregate metrics to ``df``. The returned Observation's
    ``.get`` blocks until the first action on the returned DataFrame and
    then yields {alias: value} — zero extra passes over the data."""
    obs = Observation(name)
    return df.observe(obs, *metrics), obs
