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


@register("llm_setsim_join", lsh_oracles.setsim_join_sql(threshold=0.5, shingle_k=5))
def llm_setsim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Jaccard >= 0.5 set-similarity self-join over word 5-shingles
    (5-grams stay discriminative on small-vocabulary corpora, bounding the
    prefix-join fan-out — measured 40x fewer candidates than 3-grams here),
    via canonical rarest-first ordering + prefix equi-join + integer-exact
    verify. The guaranteed-recall production tier for near-dup detection."""
    from crowdsorsa_etl_spark.operators.setsim import setsim_prefix_join

    docs = _t(spark, sf_dir, "documents")
    return setsim_prefix_join(docs, threshold=0.5, shingle_k=5)


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
    """First 8 BPE merges learned over the documents corpus.

    Pinned to strategy="distributed" so the per-merge Spark-job loop keeps
    its own oracle gate; the production driver-loop strategy is gated by
    llm_bpe_merges_256 (round9_pack)."""
    from crowdsorsa_etl_spark.operators.bpe import bpe_learn_merges

    docs = _t(spark, sf_dir, "documents")
    return bpe_learn_merges(docs, n_merges=8, strategy="distributed")


# ===========================================================================
# llm_token_budget_mix — absolute-token-budget corpus mixing ("30B web +
# 5B code"), complementing the rate-based llm_domain_mix. Deterministic
# md5 admission order; the budget CASE on both engines is generated from
# the one _BUDGETS dict, so the two sides cannot drift.
# ===========================================================================

from crowdsorsa_etl_spark.queries.curation_pack import _NTOK_SQL

#: per-source token budgets — even sources tight, odd sources loose, so the
#: admission boundary is exercised at every scale factor
_BUDGETS = {f"src{i}": (500 if i % 2 == 0 else 900) for i in range(20)}


def _budget_case_sql() -> str:
    whens = " ".join(
        f"WHEN '{g}' THEN {b}" for g, b in sorted(_BUDGETS.items())
    )
    return f"(CASE source {whens} ELSE 0 END)"


@register(
    "llm_token_budget_mix",
    f"""
    WITH toks AS (
      SELECT doc_id, source, {_NTOK_SQL} AS n_tokens FROM documents
    )
    SELECT doc_id, source, n_tokens,
           CAST(sum(n_tokens) OVER (
             PARTITION BY source
             ORDER BY md5('budget:' || CAST(doc_id AS VARCHAR)), doc_id
             ROWS UNBOUNDED PRECEDING
           ) AS BIGINT) AS cum_tokens,
           (CAST(sum(n_tokens) OVER (
             PARTITION BY source
             ORDER BY md5('budget:' || CAST(doc_id AS VARCHAR)), doc_id
             ROWS UNBOUNDED PRECEDING
           ) AS BIGINT) - n_tokens) < {_budget_case_sql()} AS kept
    FROM toks
    """,
)
def llm_token_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token-budget quota sample over documents."""
    from crowdsorsa_etl_spark.functions.text import token_count
    from crowdsorsa_etl_spark.operators.curation import token_budget_sample

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        token_count(F.col("text")).cast("bigint").alias("n_tokens"),
    )
    return token_budget_sample(docs, _BUDGETS)


# ===========================================================================
# q106_drift_psi — population stability index between two corpus slices
# (the train-vs-incoming drift monitor run before a retraining decision).
# Equal-width bins over a fixed range, Laplace-smoothed proportions (the
# standard zero-bin guard), psi_term = (p_a - p_e) * ln(p_a / p_e).
# Everything is one aggregation + a 10-row post-agg window — the 100 TB
# cost is the single groupBy(bin) shuffle with map-side combine.
# ===========================================================================

_PSI_BINS = 10
_PSI_WIDTH = 60  # n_chars bin width; fixture range is [48, 553]


@register(
    "q106_drift_psi",
    f"""
    WITH binned AS (
      SELECT least(CAST(floor(n_chars / {_PSI_WIDTH}) AS INT), {_PSI_BINS - 1}) AS bin,
             CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_expected,
             CAST(sum(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_actual
      FROM documents GROUP BY 1
    ),
    tot AS (
      SELECT CAST(sum(n_expected) AS BIGINT) AS te,
             CAST(sum(n_actual) AS BIGINT) AS ta FROM binned
    ),
    terms AS (
      SELECT bin, n_expected, n_actual,
             ((n_actual + 1.0) / (ta + {_PSI_BINS}.0)
              - (n_expected + 1.0) / (te + {_PSI_BINS}.0))
             * ln(((n_actual + 1.0) / (ta + {_PSI_BINS}.0))
                  / ((n_expected + 1.0) / (te + {_PSI_BINS}.0))) AS term
      FROM binned, tot
    )
    SELECT bin, n_expected, n_actual,
           round(term, 6) AS psi_term,
           round(sum(term) OVER (), 6) AS psi_total
    FROM terms
    """,
)
def q106_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PSI drift between the even-doc_id slice (expected) and the odd slice
    (actual) over an equal-width n_chars histogram."""
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")
    binned = (
        docs.select(
            F.least(
                F.floor(F.col("n_chars") / _PSI_WIDTH).cast("int"),
                F.lit(_PSI_BINS - 1),
            ).alias("bin"),
            (F.col("doc_id") % 2 == 0).cast("int").alias("is_e"),
        )
        .groupBy("bin")
        .agg(
            F.sum("is_e").cast("bigint").alias("n_expected"),
            F.sum(1 - F.col("is_e")).cast("bigint").alias("n_actual"),
        )
    )
    # totals ride a size-10 broadcast (bin cardinality is a constant)
    tot = binned.agg(
        F.sum("n_expected").cast("bigint").alias("te"),
        F.sum("n_actual").cast("bigint").alias("ta"),
    )
    k = float(_PSI_BINS)
    pe = (F.col("n_expected") + 1.0) / (F.col("te") + k)
    pa = (F.col("n_actual") + 1.0) / (F.col("ta") + k)
    term = (pa - pe) * F.log(pa / pe)
    terms = binned.crossJoin(F.broadcast(tot)).select(
        "bin", "n_expected", "n_actual", term.alias("term")
    )
    return terms.select(
        "bin",
        "n_expected",
        "n_actual",
        F.round("term", 6).alias("psi_term"),
        # post-aggregation: at most _PSI_BINS rows ride this global window
        F.round(F.sum("term").over(Window.partitionBy()), 6).alias("psi_total"),
    )


# ===========================================================================
# q107_frequent_pairs — apriori-pruned co-occurrence mining (market-basket
# over document token sets). The apriori bound: pairs are enumerated only
# between FREQUENT items, so the per-doc quadratic term is (frequent items
# per doc)^2, not (vocabulary)^2. Supports are exact; lift replays as the
# same double expression.
# ===========================================================================


@register(
    "q107_frequent_pairs",
    """
    WITH dtok AS (
      SELECT DISTINCT doc_id,
             unnest(string_split(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')), ' ')) AS tok
      FROM documents
    ),
    n AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs FROM dtok),
    items AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS item_support
      FROM dtok GROUP BY tok
      HAVING count(*) * 4 >= (SELECT n_docs FROM n)
    ),
    ftok AS (
      SELECT d.doc_id, d.tok, i.item_support
      FROM dtok d JOIN items i USING (tok)
    )
    SELECT a.tok AS tok_a, b.tok AS tok_b,
           CAST(count(*) AS BIGINT) AS support,
           round(count(*) * 1.0 * (SELECT n_docs FROM n)
                 / (any_value(a.item_support) * any_value(b.item_support)), 6) AS lift
    FROM ftok a JOIN ftok b ON a.doc_id = b.doc_id AND a.tok < b.tok
    GROUP BY 1, 2
    HAVING count(*) * 10 >= (SELECT n_docs FROM n)
    """,
)
def q107_frequent_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent co-occurring token pairs: items at >=25% doc support, pairs
    at >=10%, exact counts, lift attached."""
    from crowdsorsa_etl_spark.functions.text import normalize_text

    docs = _t(spark, sf_dir, "documents")
    dtok = (
        docs.select(
            "doc_id",
            F.explode(F.split(normalize_text(F.col("text")), " ")).alias("tok"),
        )
        .distinct()
    )
    n = dtok.agg(F.countDistinct("doc_id").cast("bigint").alias("n_docs"))
    items = (
        dtok.groupBy("tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("item_support"))
        .crossJoin(F.broadcast(n))
        .filter(F.col("item_support") * 4 >= F.col("n_docs"))
        .select("tok", "item_support")
    )
    # items is vocabulary-sized after the support cut — broadcast it
    ftok = dtok.join(F.broadcast(items), "tok")
    a = ftok.alias("a")
    b = ftok.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("a.tok") < F.col("b.tok")),
        )
        .groupBy(F.col("a.tok").alias("tok_a"), F.col("b.tok").alias("tok_b"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("support"),
            F.first(F.col("a.item_support")).alias("sa"),
            F.first(F.col("b.item_support")).alias("sb"),
        )
    )
    return (
        pairs.crossJoin(F.broadcast(n))
        .filter(F.col("support") * 10 >= F.col("n_docs"))
        .select(
            "tok_a",
            "tok_b",
            "support",
            F.round(
                F.col("support") * 1.0 * F.col("n_docs")
                / (F.col("sa") * F.col("sb")),
                6,
            ).alias("lift"),
        )
    )
