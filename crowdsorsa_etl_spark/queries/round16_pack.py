"""Round-16 queries: epoch-level training-order re-shuffle and the round's
scale/governance follow-ups.

* ``llm_epoch_reshuffle`` — per-epoch GLOBAL re-permutation of the shard
  store as a seeded metadata-only bijection (operators/epochshuffle.py,
  swap-or-not shuffle): epoch e's order is a pure function of
  (seed, e, pos, store size), no shard byte is rewritten. Closes the
  acknowledged trade in operators/sharding.py:16-24 — loaders previously
  approximated cross-epoch mixing by shuffling the shard LIST; now they
  get a true global permutation per epoch at metadata cost.

ORDER is load-bearing (the driver's correctness window samples the first 50
registrations): append only.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crowdsorsa_etl_spark.functions.portable_hash import hex60_sql
from crowdsorsa_etl_spark.queries._shared import _sf_cache_dir, _t, register

# ===========================================================================
# llm_epoch_reshuffle — the store is built ONCE (memoized one-shot init:
# a shard store is AT REST between ingests, the llm_shuffle_incremental
# posture); each run's live work is the two epoch manifests, which read
# (pos, doc_id) + the 1-row high-water sidecar and never write. The oracle
# replays the whole chain — seeded-hash rank -> pos, then 10 swap-or-not
# rounds per epoch as CTE stages, then the per-shard ordered id-chain md5 —
# proving the EXACT epoch order on both engines, not just counts.
# ===========================================================================

_EPOCH_SEED = "shuf:v1:"
_EPOCH_SHARD_DOCS = 64
_EPOCH_LIST = (1, 2)


def _epoch_reshuffle_sql() -> str:
    from crowdsorsa_etl_spark.operators.epochshuffle import epoch_perm_cte_sql

    key = hex60_sql(f"'{_EPOCH_SEED}' || CAST(doc_id AS VARCHAR)")
    parts, selects = [], []
    for epoch in _EPOCH_LIST:
        defs, final = epoch_perm_cte_sql(
            "base", "doc_id", "pos", "n", epoch, _EPOCH_SEED
        )
        parts.append(defs)
        selects.append(
            f"""
    SELECT {epoch} AS epoch,
           CAST(x // {_EPOCH_SHARD_DOCS} AS INT) AS eshard_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY x))
             AS id_chain_md5
    FROM {final} GROUP BY 1, 2"""
        )
    return f"""
    WITH r AS (
      SELECT doc_id,
             CAST(row_number() OVER (ORDER BY key, doc_id) - 1 AS BIGINT)
               AS pos
      FROM (SELECT doc_id, {key} AS key FROM documents)
    ),
    base AS (
      SELECT doc_id, pos, (SELECT count(*) FROM documents) AS n FROM r
    ),
    {",".join(parts)}
    {" UNION ALL ".join(selects)}
    """


def _full_store(spark: SparkSession, sf_dir: str) -> str:
    """Memoized one-shot shard store over the whole documents table
    (content-fingerprinted dir; the seed-build atomic-rename pattern)."""
    import shutil

    from crowdsorsa_etl_spark.operators.sharding import shard_store_init

    seed_dir = _sf_cache_dir(sf_dir, "shardstore_full_v1", "documents")
    if not os.path.exists(os.path.join(seed_dir, "_DONE")):
        build = tempfile.mkdtemp(prefix="shardfull_")
        shard_store_init(
            _t(spark, sf_dir, "documents").select("doc_id"),
            f"{build}/s",
            shard_docs=_EPOCH_SHARD_DOCS,
            seed=_EPOCH_SEED,
        )
        with open(os.path.join(build, "_DONE"), "w") as fh:
            fh.write("ok")
        try:
            os.rename(build, seed_dir)
        except OSError:  # concurrent builder won the rename
            shutil.rmtree(build, ignore_errors=True)
    return f"{seed_dir}/s"


@register("llm_epoch_reshuffle", _epoch_reshuffle_sql())
def llm_epoch_reshuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-epoch shard manifests under the swap-or-not global re-shuffle:
    epochs read the SAME store bytes in provably different global orders."""
    from crowdsorsa_etl_spark.operators.epochshuffle import epoch_manifest

    root = _full_store(spark, sf_dir)
    out = None
    for epoch in _EPOCH_LIST:
        m = epoch_manifest(
            spark, root, epoch, shard_docs=_EPOCH_SHARD_DOCS, seed=_EPOCH_SEED
        ).select(
            F.lit(epoch).cast("int").alias("epoch"),
            "eshard_id",
            "n_docs",
            "id_chain_md5",
        )
        out = m if out is None else out.unionAll(m)
    return out
