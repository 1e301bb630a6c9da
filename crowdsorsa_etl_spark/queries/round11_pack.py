"""Round 11: language-model curation tier (interpolated Kneser–Ney LM,
CCNet perplexity buckets), dictionary tagging (Aho–Corasick), information-
theoretic quality signals, and a SentencePiece-style unigram-LM tokenizer
with an exact enumeration oracle.

Registration ORDER is load-bearing (the driver's correctness window samples
the first 50 registrations); this module is imported LAST by
queries/__init__.py, so its entries append after the round-10 tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crowdsorsa_etl_spark.queries._shared import _t, register


# ===========================================================================
# llm_kneser_ney_logprob — interpolated Kneser–Ney bigram LM scores, the
# CCNet/KenLM filter model one smoothing class above add-one
# (llm_bigram_logprob). One corpus-keyed shuffle builds the count table;
# every derived statistic aggregates over bigram TYPES, not occurrences.
# ===========================================================================

from crowdsorsa_etl_spark.operators.ngramlm import (
    kneser_ney_bigram_scores,
    kneser_ney_bigram_sql,
    perplexity_buckets,
    perplexity_buckets_sql,
)


@register("llm_kneser_ney_logprob", kneser_ney_bigram_sql())
def llm_kneser_ney_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc mean interpolated-KN bigram log-probability, trained on the
    corpus itself (docs with <2 tokens drop out on both engines)."""
    return kneser_ney_bigram_scores(_t(spark, sf_dir, "documents"))


# ===========================================================================
# llm_perplexity_buckets — CCNet head/middle/tail thirds per language by
# LM score, thresholds via integer histogram bins (the cumulative window
# runs over (lang, bin) histogram rows, never over documents — no
# per-language corpus sort, no SinglePartition).
# ===========================================================================


def _ppl_buckets_sql() -> str:
    return f"""
    WITH scores_raw AS ({kneser_ney_bigram_sql()}),
    scores AS (
      SELECT s.doc_id, d.lang, s.n_bigrams, s.avg_logprob
      FROM scores_raw s JOIN documents d USING (doc_id)
    ),
    {perplexity_buckets_sql(scores_cte="scores")}
    SELECT * FROM bucketed
    """


@register("llm_perplexity_buckets", _ppl_buckets_sql())
def llm_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet bucket assignment: each document labeled head/middle/tail of
    its language's KN-perplexity distribution."""
    docs = _t(spark, sf_dir, "documents")
    scores = kneser_ney_bigram_scores(docs).join(
        docs.select("doc_id", "lang"), "doc_id"
    ).select("doc_id", "lang", "n_bigrams", "avg_logprob")
    return perplexity_buckets(scores)


# ===========================================================================
# llm_dictionary_tag — Aho–Corasick multi-pattern tagging: one narrow
# Arrow-batched pass over the corpus counts OVERLAPPING occurrences of
# every dictionary keyword (blocklist / gazetteer / lexicon shape). The
# dictionary deliberately nests ("tab" ⊂ "table", "at" ⊂ "data"/"batch",
# "a a" spans word boundaries) so the suffix-link machinery is exercised
# for real; the oracle counts matches by definition (enumerate every start
# position) — O(dict × corpus), fine at oracle scale.
# ===========================================================================

_TAG_KEYWORDS = [
    "a",
    "a a",
    "ab",
    "at",
    "tab",
    "table",
    "data",
    "order",
    "row",
    "rt",
]


def _dictionary_tag_sql() -> str:
    from crowdsorsa_etl_spark.operators.dicttag import dictionary_tag_sql
    from crowdsorsa_etl_spark.queries._shared import _NORM_SQL

    return dictionary_tag_sql(_TAG_KEYWORDS, norm_sql=_NORM_SQL)


@register("llm_dictionary_tag", _dictionary_tag_sql())
def llm_dictionary_tag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(doc, keyword) overlapping match counts over the normalized
    text, via a worker-local Aho–Corasick automaton."""
    from crowdsorsa_etl_spark.operators.dicttag import dictionary_tag

    return dictionary_tag(_t(spark, sf_dir, "documents"), _TAG_KEYWORDS)


# ===========================================================================
# llm_char_entropy — information-density quality signal: Shannon entropy
# of each doc's normalized character distribution, computed entirely with
# higher-order functions (array_distinct × filter-count) — zero shuffle,
# zero Python, whole-stage codegen. The sibling zlib compression-ratio
# signal (operators/curation.compression_signals) is pytest-gated (no SQL
# zlib exists to oracle against).
# ===========================================================================


def _char_entropy_sql() -> str:
    from crowdsorsa_etl_spark.functions.text import char_entropy_sql

    return char_entropy_sql()


@register("llm_char_entropy", _char_entropy_sql())
def llm_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, entropy): per-doc character entropy in nats, 6 dp."""
    from crowdsorsa_etl_spark.functions.text import char_entropy, normalize_text

    docs = _t(spark, sf_dir, "documents")
    return docs.filter(
        F.length(normalize_text(F.col("text"))) > 0
    ).select("doc_id", char_entropy(F.col("text")).alias("entropy"))


# ===========================================================================
# Unigram-LM tokenizer tier (operators/unigram.py) — the SentencePiece
# family next to BPE: seed vocab (substring counts over distinct words),
# Viterbi segmentation with integer µnat costs and a total-order
# tie-break, and a hard-EM count re-estimation step. The oracle picks the
# SAME segmentation by enumerating all 2^(L-1) masks per distinct word —
# the definition, not a second DP. Cost artifacts are memoized per
# fixture like the BPE merge table (_BPE_ARTIFACTS posture).
# ===========================================================================

_UNIGRAM_COSTS: dict = {}


def _unigram_costs(spark: SparkSession, sf_dir: str) -> dict:
    from crowdsorsa_etl_spark.operators.unigram import (
        piece_costs,
        unigram_seed_vocab,
    )
    from crowdsorsa_etl_spark.queries._shared import _sf_cache_dir

    key = _sf_cache_dir(sf_dir, "unigram_vocab", "documents")
    if key not in _UNIGRAM_COSTS:
        # the vocabulary IS the bounded tokenizer artifact — collecting it
        # is the contract (BPE merge-table posture), not a scale leak
        rows = unigram_seed_vocab(_t(spark, sf_dir, "documents")).collect()
        _UNIGRAM_COSTS[key] = piece_costs(rows)
    return _UNIGRAM_COSTS[key]


def _unigram_norm_sql() -> str:
    from crowdsorsa_etl_spark.queries._shared import _NORM_SQL

    return _NORM_SQL


def _uv_sql() -> str:
    from crowdsorsa_etl_spark.operators.unigram import unigram_vocab_sql

    return unigram_vocab_sql(norm_sql=_unigram_norm_sql())


@register("llm_unigram_vocab", _uv_sql())
def llm_unigram_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seed vocabulary: substring pieces (len ≤ 4) with occurrence-weighted
    counts, pruned at min_count except single chars."""
    from crowdsorsa_etl_spark.operators.unigram import unigram_seed_vocab

    return unigram_seed_vocab(_t(spark, sf_dir, "documents"))


def _ut_sql() -> str:
    from crowdsorsa_etl_spark.operators.unigram import unigram_tokenize_sql

    return unigram_tokenize_sql(norm_sql=_unigram_norm_sql())


@register("llm_unigram_tokenize", _ut_sql())
def llm_unigram_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc Viterbi piece stream (count + md5 fingerprint), unigram-LM
    scored with integer µnat costs."""
    from crowdsorsa_etl_spark.operators.unigram import unigram_tokenize

    docs = _t(spark, sf_dir, "documents")
    return unigram_tokenize(docs, _unigram_costs(spark, sf_dir))


def _ue_sql() -> str:
    from crowdsorsa_etl_spark.operators.unigram import unigram_em_sql

    return unigram_em_sql(norm_sql=_unigram_norm_sql())


@register("llm_unigram_em_step", _ue_sql())
def llm_unigram_em_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-EM re-estimated piece counts from the Viterbi segmentations."""
    from crowdsorsa_etl_spark.operators.unigram import unigram_em_counts

    docs = _t(spark, sf_dir, "documents")
    return unigram_em_counts(docs, _unigram_costs(spark, sf_dir))


def _uti_sql() -> str:
    from crowdsorsa_etl_spark.operators.unigram import unigram_token_ids_sql

    return unigram_token_ids_sql(norm_sql=_unigram_norm_sql())


@register("llm_unigram_token_ids", _uti_sql())
def llm_unigram_token_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-tokenizer token ids: Viterbi pieces mapped through the
    piece-sorted vocab id table, id stream fingerprinted per doc."""
    from crowdsorsa_etl_spark.operators.unigram import unigram_token_ids

    docs = _t(spark, sf_dir, "documents")
    return unigram_token_ids(docs, _unigram_costs(spark, sf_dir))
