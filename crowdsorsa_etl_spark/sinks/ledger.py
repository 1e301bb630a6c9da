"""Epoch-partitioned keyed ledger — the shared replay-safety core behind
both exactly-once sinks (HTTP push, streaming curation ingest).

The pattern: foreachBatch is at-least-once, so a crash between a completed
side effect and the checkpoint commit replays the whole batch. A parquet
ledger of settled keys, anti-joined before the side effect and rewritten
per epoch after it, upgrades the composition to effectively-once per key
across restarts. Two invariants both consumers must hold (learned the hard
way — see the round-7 advice trail in sinks/http_push.py):

* a ledger that EXISTS but cannot be read must RAISE — degrading to
  "first epoch" silently re-fires every side effect;
* a REPLAYED epoch must rewrite its partition with the FULL batch key set
  (fresh keys ∪ batch keys already settled), never the post-anti-join
  remainder — an empty overwrite erases history and re-fires on the next
  replay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: F401 (callers' convenience)


def read_ledger_keys(spark, ledger_dir: str, cols: list[str]) -> DataFrame | None:
    """The ledger's settled rows (``cols``, deduped on the first col), or
    None when the ledger does not exist yet. Existence is probed via the
    Hadoop FS API (HDFS/S3/local alike); genuine read errors propagate."""
    jvm_path = spark._jvm.org.apache.hadoop.fs.Path(ledger_dir)
    fs = jvm_path.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(jvm_path):
        return None
    return spark.read.parquet(ledger_dir).select(*cols).dropDuplicates([cols[0]])


def epoch_ledger_rows(
    settled_now: DataFrame,
    seen: DataFrame | None,
    batch_keys: DataFrame,
    key_col: str,
) -> DataFrame:
    """The rows to overwrite this epoch's partition with: keys settled by
    THIS run plus the batch's keys already settled earlier (their original
    ledger rows, so replay preserves failure accounting too). ``seen`` must
    carry the same columns as ``settled_now``."""
    if seen is None:
        return settled_now
    prior = seen.join(batch_keys.select(key_col).distinct(), key_col, "left_semi")
    return settled_now.unionByName(prior)
