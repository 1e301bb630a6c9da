"""Round 13: diagnostics and training-serving operators a production
corpus pipeline runs around the core dedup/tokenizer tiers — an LSH
precision/recall audit against exact shingle-Jaccard ground truth, hard-
negative mining for retrieval training, length-bucketed inference batching
with a padding-waste report, a WordPiece tokenizer (the third tokenizer
family: likelihood-scored learn + greedy longest-match encode), and
end-to-end entity resolution (blocked linkage pairs -> connected
components -> golden record).

Registration ORDER is load-bearing (the driver's correctness window samples
the first 50 registrations); this module is imported LAST by
queries/__init__.py, so its entries append after the round-12 tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crowdsorsa_etl_spark.queries._shared import _lsh_pairs, _t, register


# ===========================================================================
# llm_lsh_audit — measure, don't guess: precision/recall of the banded
# MinHash candidate generator against EXACT shingle-set Jaccard ground
# truth, per resemblance threshold. MinHash estimates shingle resemblance,
# so the truth tier reuses the identical shingle universe (same token
# hashes, same Carter-Wegman combine, trailing shingles included) — an
# audit against token-set Jaccard would grade the sketch on a quantity it
# never estimated. Truth pair generation is the AllPairs inverted-index
# join (pairs sharing >= 1 shingle; disjoint pairs have jaccard 0 < every
# threshold), so the audit itself never goes |docs|^2; at corpus scale the
# operator's max_df stop-shingle cap bounds the per-shingle blowup. The
# final numbers are two 1-row conditional aggregations broadcast-joined —
# no theta join, no SinglePartition window.
# ===========================================================================

_AUDIT_THRESHOLDS = (0.2, 0.3, 0.5, 0.7)


def _lsh_audit_oracle() -> str:
    from crowdsorsa_etl_spark.lsh_oracles import lsh_audit_sql

    return lsh_audit_sql(thresholds=_AUDIT_THRESHOLDS)


@register("llm_lsh_audit", _lsh_audit_oracle())
def llm_lsh_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-threshold precision/recall of minhash_lsh_candidates vs exact
    shingle-Jaccard (operators/dedup.shingle_jaccard_pairs)."""
    from crowdsorsa_etl_spark.operators.dedup import shingle_jaccard_pairs

    docs = _t(spark, sf_dir, "documents")
    truth = shingle_jaccard_pairs(docs, portable=True)
    cand = _lsh_pairs(spark, sf_dir).select("id_a", "id_b")
    candj = cand.join(truth, ["id_a", "id_b"], "left").select(
        F.coalesce(F.col("jaccard"), F.lit(0.0)).alias("jac")
    )

    def _counts(prefix: str) -> list:
        return [
            F.coalesce(
                F.sum(
                    F.when(F.col("jac") >= F.lit(t), F.lit(1)).otherwise(
                        F.lit(0)
                    )
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias(f"{prefix}{i}")
            for i, t in enumerate(_AUDIT_THRESHOLDS)
        ]

    tstats = truth.select(F.col("jaccard").alias("jac")).agg(*_counts("nt"))
    cstats = candj.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cand"), *_counts("nh")
    )
    row = tstats.join(F.broadcast(cstats))
    per_t = row.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(float(t)).alias("threshold"),
                        F.col(f"nt{i}").alias("n_true"),
                        F.col("n_cand").alias("n_candidates"),
                        F.col(f"nh{i}").alias("n_hit"),
                    )
                    for i, t in enumerate(_AUDIT_THRESHOLDS)
                ]
            )
        ).alias("s")
    ).select("s.*")
    return per_t.select(
        "threshold",
        "n_true",
        "n_candidates",
        "n_hit",
        F.round(
            F.col("n_hit") / F.nullif(F.col("n_candidates"), F.lit(0)), 6
        ).alias("precision"),
        F.round(F.col("n_hit") / F.nullif(F.col("n_true"), F.lit(0)), 6).alias(
            "recall"
        ),
    )
