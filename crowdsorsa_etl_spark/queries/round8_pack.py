"""Round 8: IVF-PQ index-at-rest (the FAISS production tier capstone),
query-table BM25 with incremental postings, and polygon-polygon spatial
join.

Registration ORDER is load-bearing (the driver's correctness window samples
the first 50 registrations); this module is imported LAST by
queries/__init__.py, so its entries append after q99.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crowdsorsa_etl_spark import lsh_oracles
from crowdsorsa_etl_spark.queries._shared import _sf_cache_dir, _t, register


# ===========================================================================
# llm_ivfpq_topk — IVF-PQ: PQ codes persisted partitioned by IVF list;
# query = partition-pruned ADC + exact re-rank. The composed production
# shape of the ANN ladder (see operators/pq.ivfpq_write_index). The oracle
# replays BOTH trainers symbolically: the coarse spherical k-means
# (shared with llm_ivf_topk) and the per-subspace codebooks (shared with
# llm_pq_topk), then restricts ADC to probed lists exactly as the
# partition-pruned scan does.
# ===========================================================================


@register(
    "llm_ivfpq_topk",
    lsh_oracles.ivfpq_topk_sql(
        dim=64, k=5, n_lists=16, n_probe=8, m=8, k_codes=64,
        candidate_margin=32, sample_size=2048,
        ivf_iterations=5, pq_iterations=4, query_pred="id < 10",
    ),
)
def llm_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ ANN through the PERSISTED index: build once per fixture
    (codes partitioned by list_id, centroids + codebooks alongside), then
    search via pruned partition read + codegen ADC + exact re-rank. The
    query plan has zero Python stages — encoding happened at write time."""
    from crowdsorsa_etl_spark.operators.pq import (
        ivfpq_query_index,
        ivfpq_write_index,
    )

    emb = _t(spark, sf_dir, "embeddings")
    path = _sf_cache_dir(sf_dir, "ivfpq", "embeddings")
    if not os.path.exists(os.path.join(path, "_centroids")):
        ivfpq_write_index(
            emb, path,
            n_lists=16, m=8, k_codes=64, sample_size=2048, pq_iterations=4,
        )
    return ivfpq_query_index(
        spark, path, emb.filter(F.col("vec_id") < 10),
        k=5, n_probe=8, candidate_margin=32,
    )
