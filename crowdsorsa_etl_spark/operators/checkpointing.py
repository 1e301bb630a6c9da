"""Lineage truncation policy for iterative operators.

``localCheckpoint()`` (the default everywhere in this engine) materializes
partitions on executor block managers — the right cost model for lineage
truncation, but NOT executor-loss tolerant: on a real cluster, losing an
executor mid-iteration loses its checkpointed blocks and fails the job
instead of recomputing (localCheckpoint deliberately severs the lineage
needed to rebuild them).

Iterative operators therefore take a ``reliable_checkpoints`` flag routed
here: when True, lineage truncation uses reliable ``checkpoint()`` writes to
``spark.sparkContext`` checkpoint dir (HDFS/object store on a cluster), so
an executor loss at iteration k recomputes from the round-(k-1) checkpoint
files instead of killing the run. The caller must have called
``sparkContext.setCheckpointDir`` — this module raises a clear error rather
than silently picking a local path that would be wrong on a cluster.

Single-shot materializations (audit capture, bucket tables reused within one
job) keep plain localCheckpoint: re-running the whole short job on executor
loss is acceptable there, and reliable checkpoints would double their I/O.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def truncate_lineage(df: DataFrame, *, reliable: bool = False) -> DataFrame:
    """Materialize ``df`` and cut its lineage.

    reliable=False → ``localCheckpoint`` (executor-memory blocks; fast, not
    loss-tolerant). reliable=True → ``checkpoint`` (files under the session's
    checkpoint dir; survives executor loss — set one with
    ``spark.sparkContext.setCheckpointDir(path)`` first).
    """
    if not reliable:
        return df.localCheckpoint()
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is None:
        raise ValueError(
            "reliable_checkpoints=True requires a checkpoint directory: call "
            "spark.sparkContext.setCheckpointDir(<HDFS/object-store path>) "
            "before running this operator (a cluster-visible path — "
            "executor-local disks defeat the purpose)"
        )
    return df.checkpoint(eager=True)
