"""Round 8c: exact set-similarity join (prefix filtering), edit-distance
join, distributed BPE vocabulary learning, token-budget mixture sampling,
corpus drift detection (PSI), and apriori co-occurrence mining.

Registration ORDER is load-bearing (the driver's correctness window samples
the first 50 registrations); this module is imported LAST by
queries/__init__.py, so its entries append after the round-8b tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crowdsorsa_etl_spark import lsh_oracles
from crowdsorsa_etl_spark.queries._shared import _t, register


# ===========================================================================
# llm_setsim_join — the exact-threshold complement of the MinHash tier:
# every pair with shingle-Jaccard >= 0.5, zero probability of a miss,
# never all-pairs (AllPairs/PPJoin prefix filtering — see operators/setsim).
# The oracle is the brute-force all-pairs join, so any unsoundness in the
# prefix or size filter (a dropped qualifying pair) breaks the hash.
# ===========================================================================


@register("llm_setsim_join", lsh_oracles.setsim_join_sql(threshold=0.5, shingle_k=3))
def llm_setsim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Jaccard >= 0.5 set-similarity self-join over word 3-shingles,
    via canonical rarest-first ordering + prefix equi-join + integer-exact
    verify. The guaranteed-recall production tier for near-dup detection."""
    from crowdsorsa_etl_spark.operators.setsim import setsim_prefix_join

    docs = _t(spark, sf_dir, "documents")
    return setsim_prefix_join(docs, threshold=0.5, shingle_k=3)


# ===========================================================================
# llm_editdist_join — string-similarity join on EDIT distance: banded
# MinHash-LSH candidates + length-difference filter + exact levenshtein
# verify. The oracle is all-pairs levenshtein (length-band prefiltered by
# the necessary |len diff| <= k condition only), so an LSH recall miss on
# a qualifying pair breaks the hash.
# ===========================================================================


@register("llm_editdist_join", lsh_oracles.editdist_join_sql(max_dist=6))
def llm_editdist_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairs of documents within levenshtein distance 6 of each other
    (normalized text) — the entity-resolution / OCR-noise dedup shape."""
    from crowdsorsa_etl_spark.operators.setsim import editdist_join

    docs = _t(spark, sf_dir, "documents")
    return editdist_join(docs, max_dist=6)


# ===========================================================================
# llm_bpe_merges — distributed BPE tokenizer training (the word-count-
# dictionary formulation real trainers use: the corpus collapses to one
# (word, count) aggregation, merges iterate over that). The oracle unrolls
# the identical merge loop as DuckDB CTEs — same normalization, char
# spacing, space-doubling replace, and (total DESC, pair ASC) argmax.
# ===========================================================================

from crowdsorsa_etl_spark.operators.bpe import bpe_merges_sql as _bpe_sql


@register("llm_bpe_merges", _bpe_sql(n_merges=8))
def llm_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First 8 BPE merges learned over the documents corpus."""
    from crowdsorsa_etl_spark.operators.bpe import bpe_learn_merges

    docs = _t(spark, sf_dir, "documents")
    return bpe_learn_merges(docs, n_merges=8)
