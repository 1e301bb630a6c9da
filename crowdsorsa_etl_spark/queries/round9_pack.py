"""Round 9: production-scale BPE merge learning (driver loop), exact
substring dedup (Lee et al. 2022 tier), IVF-PQ incremental append, and the
distributed-fit quality classifier.

Registration ORDER is load-bearing (the driver's correctness window samples
the first 50 registrations); this module is imported LAST by
queries/__init__.py, so its entries append after the round-8d tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crowdsorsa_etl_spark.queries._shared import _t, register


# ===========================================================================
# llm_bpe_merges_256 — BPE learning at a production-ish merge count: the
# merge LOOP runs on the driver over the collected (word, count) dictionary
# (vocabulary-sized by construction) with incremental pair-count updates —
# ONE Spark job total instead of one job per merge. The oracle unrolls all
# 256 stages in DuckDB (balanced-union output so the plan tree stays under
# DuckDB's depth guard); sf0.01's vocabulary exhausts before 256 merges, so
# the early-break / no-op-stage guards on BOTH engines are exercised for
# real, not just in unit fixtures.
# ===========================================================================

from crowdsorsa_etl_spark.operators.bpe import bpe_merges_sql as _bpe_sql


@register("llm_bpe_merges_256", _bpe_sql(n_merges=256))
def llm_bpe_merges_256(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First 256 BPE merges via the driver-loop strategy (the 32k-vocab
    production shape: no per-merge cluster round-trip)."""
    from crowdsorsa_etl_spark.operators.bpe import bpe_learn_merges

    docs = _t(spark, sf_dir, "documents")
    return bpe_learn_merges(docs, n_merges=256, strategy="driver")


# ===========================================================================
# llm_substring_dedup — exact substring dedup (Lee et al. ACL'22
# EXACTSUBSTR, distributed as k-shingle runs): every maximal token span of
# >= 8 tokens whose every 8-token window repeats corpus-wide. The oracle
# brute-forces the identical definition (IN-subquery flagging, same md5
# shingle key, same island rule) — a missed window, an off-by-one in span
# extension, or an island-merge bug breaks the hash.
# ===========================================================================

from crowdsorsa_etl_spark.operators.substring import (
    substring_clean_sql as _sub_clean_sql,
    substring_spans_sql as _sub_spans_sql,
)


@register("llm_substring_dedup", _sub_spans_sql(k=8))
def llm_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal duplicated substring runs (>= 8 tokens) per document."""
    from crowdsorsa_etl_spark.operators.substring import (
        duplicated_substring_spans,
    )

    docs = _t(spark, sf_dir, "documents")
    return duplicated_substring_spans(docs, min_run=8)


@register("llm_substring_dedup_clean", _sub_clean_sql(k=8))
def llm_substring_dedup_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The removal step: drop every token covered by a duplicated run and
    hash the surviving token stream (md5 gates exact coverage)."""
    from crowdsorsa_etl_spark.operators.substring import (
        remove_duplicated_substrings,
    )

    docs = _t(spark, sf_dir, "documents")
    return remove_duplicated_substrings(docs, min_run=8)


# ===========================================================================
# llm_ivfpq_incremental — IVF-PQ index maintenance: build the index from a
# base corpus, APPEND a batch with FROZEN centroids/codebooks (pure file
# append into the list partitions — batch-sized cost, existing rows never
# touched), then search. The oracle replays the FULL-corpus IVF-PQ build
# symbolically (training sample = first 256 ids, which the base contains
# by construction), so the hash match proves append-then-search ≡ full
# rebuild cross-engine — the same merged≡rebuilt gate as
# llm_bm25_incremental and llm_dedup_index.
# ===========================================================================

from crowdsorsa_etl_spark import lsh_oracles as _lo


@register(
    "llm_ivfpq_incremental",
    _lo.ivfpq_topk_sql(
        dim=64, k=5, n_lists=16, n_probe=8, m=8, k_codes=64,
        candidate_margin=32, sample_size=256,
        ivf_iterations=5, pq_iterations=4, query_pred="id < 10",
    ),
)
def llm_ivfpq_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ search through an index built base-then-append: the batch's
    codes are assigned/encoded with the stored artifacts and appended into
    the existing ``list_id=`` partitions."""
    import shutil
    import tempfile

    from crowdsorsa_etl_spark.operators.pq import (
        ivfpq_append_index,
        ivfpq_query_index,
        ivfpq_write_index,
    )

    emb = _t(spark, sf_dir, "embeddings")
    # base keeps every id < 256 — the deterministic training sample — so
    # frozen-artifact append is provably identical to the full rebuild
    base = emb.filter((F.col("vec_id") < 256) | (F.col("vec_id") % 10 != 0))
    batch = emb.filter((F.col("vec_id") >= 256) & (F.col("vec_id") % 10 == 0))
    path = tempfile.mkdtemp(prefix="ivfpqidx_")
    try:
        ivfpq_write_index(
            base, path,
            n_lists=16, m=8, k_codes=64, sample_size=256, pq_iterations=4,
        )
        ivfpq_append_index(batch, path)
        return ivfpq_query_index(
            spark, path, emb.filter(F.col("vec_id") < 10),
            k=5, n_probe=8, candidate_margin=32,
        ).localCheckpoint()
    finally:
        shutil.rmtree(path, ignore_errors=True)
