"""Round 4: full-corpus distributed k-means tier (SemDeDup / IVF at scale).

Split from the original monolithic queries.py in round 5. Registration
ORDER is load-bearing (the driver's correctness window samples the first 50
registrations), so modules are imported in the original file order by
queries/__init__.py, which also asserts the canonical order afterwards.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from crowdsorsa_etl_spark import lsh_oracles  # noqa: F401
from crowdsorsa_etl_spark.queries._shared import (
    _t,
    register,
)

# ===========================================================================
# Round 4: full-corpus distributed k-means tier (SemDeDup / IVF at scale)
# ===========================================================================


@register(
    "llm_semdedup_scaled",
    lsh_oracles.semdedup_sql(n_clusters=64, epsilon=0.45, sample_size=1_000_000_000),
)
def llm_semdedup_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup at 64 clusters trained on the FULL corpus with distributed
    Lloyd iterations (``operators/similarity.kmeans_train_distributed``) —
    the 100 TB configuration, where n_clusters must track corpus size to
    keep the in-cluster |c|^2 pair step bounded (the paper's ~1e5-cluster
    regime). Oracle since round 6: with the trainer's merge fold made
    deterministic (array_sort), the full-corpus sequential Lloyd replay
    (semdedup_sql with the sample = the whole corpus) produces the same
    integer clustering decisions — the distributed partial sums differ from
    the SQL's sequential sums only in the last ulp, far inside the argmax
    margins. Trainer-parity (1e-6), planted-duplicate keep-set, and
    keep-rate gates remain in tests/."""
    from crowdsorsa_etl_spark.operators.similarity import semdedup

    emb = _t(spark, sf_dir, "embeddings")
    out = semdedup(emb, n_clusters=64, epsilon=0.45, trainer="distributed")
    return out.orderBy("vec_id")


@register(
    "llm_ivf_topk_scaled",
    lsh_oracles.ivf_topk_sql(n_lists=64, n_probe=16, sample_size=1_000_000_000),
)
def llm_ivf_topk_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN top-k with the coarse quantizer trained on the FULL corpus
    (distributed Lloyd) at n_lists=64 — the configuration a 100 TB corpus
    needs (n_lists ~ sqrt(N) exceeds any driver-side sample). Oracle since
    round 6 (same determinism argument as llm_semdedup_scaled: sorted
    partial-sum fold + ulp-robust integer decisions); recall >= 0.85 vs
    exact cosine_topk stays gated in tests/test_operators.py."""
    from crowdsorsa_etl_spark.operators.similarity import ivf_topk

    emb = _t(spark, sf_dir, "embeddings")
    return ivf_topk(
        emb,
        emb.filter(F.col("vec_id") < 10),
        k=5,
        n_lists=64,
        n_probe=16,
        trainer="distributed",
    )


