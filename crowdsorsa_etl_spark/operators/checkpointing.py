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

Eager vs lazy (r17, measured): ``localCheckpoint(eager=False)`` removes
the barrier job + full block read-back, and the block manager's
per-block get-or-compute lock keeps results identical when several
stages race for the blocks. But a same-session A/B across 13 headline
queries showed lazy SLOWER at 11 of the multi-reference sites (+0.2 to
+0.9 s — the first consumer is typically a broadcast-exchange build,
whose block-locked materialization serializes against the other probe
stages), and faster only where the first consumer is a driver-side
collect that owns the whole job (global_rank's offsets collect, the
minhash signature pin). Default stays EAGER for multi-reference pins;
use lazy only where the first consumer is a full-parallelism collect.
Never make ``truncate_lineage`` lazy: pagerank's loop has no
per-iteration action, so lazy checkpoints there would never fire and
the final job would re-run the whole iteration lineage.
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
