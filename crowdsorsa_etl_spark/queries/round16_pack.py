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


# ===========================================================================
# llm_t_closeness — the third rung of the release-governance ladder
# (k-anonymity -> l-diversity -> t-closeness, Li/Li/Venkatasubramanian
# 2007): a QI class can clear both k and l yet still leak because its
# sensitive-attribute DISTRIBUTION deviates from the corpus' (skewness
# attack). QI = (lang, source) — the k-anonymity quasi-identifier minus
# the length column — and the ORDERED sensitive attribute is the pow2
# char-length bucket. Closeness is the ordered-domain Earth Mover's
# Distance in prefix-sum form:
#
#   t = (1/(m-1)) * sum_i | CumP_i - CumQ_i |
#
# kept EXACT by clearing denominators: each term |cump_i*n_total -
# cumq_i*n_docs| is a BIGINT, emd_den = n_docs*n_total*(m-1), and the
# violation flag compares emd_num*5 > emd_den (t > 0.2) in integers —
# zero float drift between engines; the only division is the 6-dp
# display ratio. Scale: two map-side-combined data-sized aggregations
# (class x bucket, global bucket); every cumsum/window/join downstream
# runs on the <=|langs x sources x buckets| aggregate grid (~500 rows at
# any corpus size), broadcast where joined back.
# ===========================================================================

_TCLOSE_NUM = 1  # threshold t = _TCLOSE_NUM / _TCLOSE_DEN = 0.2
_TCLOSE_DEN = 5

_POW2_SQL = """CASE WHEN CAST(power(2, ceil(log2(greatest(n_chars, 1)))) AS BIGINT) // 2 >= greatest(n_chars, 1)
                  THEN CAST(power(2, ceil(log2(greatest(n_chars, 1)))) AS BIGINT) // 2
                  ELSE CAST(power(2, ceil(log2(greatest(n_chars, 1)))) AS BIGINT) END"""


@register(
    "llm_t_closeness",
    f"""
    WITH q AS (
      SELECT lang, source, {_POW2_SQL} AS len_bucket FROM documents
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM q),
    g AS (
      SELECT len_bucket, CAST(count(*) AS BIGINT) AS cq
      FROM q GROUP BY len_bucket
    ),
    m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM g),
    gc AS (
      SELECT len_bucket,
             CAST(sum(cq) OVER (ORDER BY len_bucket) AS BIGINT) AS cumq
      FROM g
    ),
    classes AS (
      SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs
      FROM q GROUP BY lang, source
    ),
    cb AS (
      SELECT lang, source, len_bucket, CAST(count(*) AS BIGINT) AS cp
      FROM q GROUP BY lang, source, len_bucket
    ),
    grid AS (
      SELECT c.lang, c.source, c.n_docs, d.len_bucket, d.cumq
      FROM classes c CROSS JOIN gc d
    ),
    cc AS (
      SELECT gr.lang, gr.source, gr.n_docs, gr.len_bucket, gr.cumq,
             CAST(sum(coalesce(cb.cp, 0)) OVER (
               PARTITION BY gr.lang, gr.source ORDER BY gr.len_bucket
             ) AS BIGINT) AS cump
      FROM grid gr
      LEFT JOIN cb ON cb.lang = gr.lang AND cb.source = gr.source
                  AND cb.len_bucket = gr.len_bucket
    ),
    e AS (
      SELECT cc.lang, cc.source, cc.n_docs,
             CAST(sum(abs(cc.cump * t.n_total - cc.cumq * cc.n_docs))
                  AS BIGINT) AS emd_num,
             CAST(cc.n_docs * t.n_total * (max(m.m) - 1) AS BIGINT)
               AS emd_den
      FROM cc CROSS JOIN tot t CROSS JOIN m
      GROUP BY cc.lang, cc.source, cc.n_docs, t.n_total
    )
    SELECT lang, source, n_docs, emd_num, emd_den,
           round(emd_num * 1.0 / emd_den, 6) AS t_emd,
           emd_num * {_TCLOSE_DEN} > emd_den * {_TCLOSE_NUM} AS violates
    FROM e
    """,
)
def llm_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-QI-class ordered EMD of the sensitive length-bucket distribution
    vs the corpus distribution, exact-integer, with the t>0.2 flag."""
    from pyspark.sql import Window

    from crowdsorsa_etl_spark.queries.round13_pack import _pow2_bucket

    docs = _t(spark, sf_dir, "documents")
    q = docs.select(
        "lang", "source", _pow2_bucket(F.col("n_chars")).alias("len_bucket")
    )
    # the two data-sized aggregations (map-side combined); everything
    # below runs on their tiny outputs
    g = q.groupBy("len_bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("cq")
    )
    cb = q.groupBy("lang", "source", "len_bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("cp")
    )
    classes = cb.groupBy("lang", "source").agg(
        F.sum("cp").cast("bigint").alias("n_docs")
    )
    # global cumulative bucket mass: |buckets| rows — the unpartitioned
    # window is over the aggregate domain, never the corpus
    gc = g.withColumn(
        "cumq",
        F.sum("cq")
        .over(
            Window.orderBy("len_bucket").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        )
        .cast("bigint"),
    ).select("len_bucket", "cumq")
    scalars = g.agg(
        F.sum("cq").cast("bigint").alias("n_total"),
        F.count(F.lit(1)).cast("bigint").alias("m"),
    )
    grid = classes.crossJoin(F.broadcast(gc))
    cc = (
        grid.join(F.broadcast(cb), ["lang", "source", "len_bucket"], "left")
        .withColumn(
            "cump",
            F.sum(F.coalesce(F.col("cp"), F.lit(0)))
            .over(
                Window.partitionBy("lang", "source")
                .orderBy("len_bucket")
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            .cast("bigint"),
        )
        .crossJoin(F.broadcast(scalars))
    )
    e = cc.groupBy("lang", "source", "n_docs", "n_total", "m").agg(
        F.sum(
            F.abs(
                F.col("cump") * F.col("n_total")
                - F.col("cumq") * F.col("n_docs")
            )
        )
        .cast("bigint")
        .alias("emd_num")
    )
    return e.select(
        "lang",
        "source",
        "n_docs",
        "emd_num",
        (F.col("n_docs") * F.col("n_total") * (F.col("m") - 1))
        .cast("bigint")
        .alias("emd_den"),
    ).select(
        "lang",
        "source",
        "n_docs",
        "emd_num",
        "emd_den",
        F.round(F.col("emd_num") * F.lit(1.0) / F.col("emd_den"), 6).alias(
            "t_emd"
        ),
        (
            F.col("emd_num") * F.lit(_TCLOSE_DEN)
            > F.col("emd_den") * F.lit(_TCLOSE_NUM)
        ).alias("violates"),
    )


# ===========================================================================
# llm_lpa_communities — label-propagation communities over the SAME
# memoized dup-graph edges the cluster registry consumes: CC answers
# "reachable at all" (one bridge doc chains two 50-doc templates into
# one 100-doc cluster), LPA answers "densely tied" (each template keeps
# its own label; the bridge joins whichever side out-votes). Synchronous,
# fixed 4 rounds, (count DESC, label ASC) argmax — deterministic on both
# engines, so the oracle replays every round as unrolled CTE stages over
# the same portable-MinHash edge SQL (the pagerank_sql posture). Output
# joins the corpus: isolated docs form their own singleton community.
# Scale: O(rounds * |E|) — two uniform-key shuffles per round, lineage
# truncated; no transitive closure, no component-sized skew (a vertex's
# round state is its neighbor multiset, never the whole community).
# ===========================================================================

_LPA_ROUNDS = 4


def _lpa_sql() -> str:
    from crowdsorsa_etl_spark.lsh_oracles import lpa_sql

    return lpa_sql(rounds=_LPA_ROUNDS)


@register("llm_lpa_communities", _lpa_sql())
def llm_lpa_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-round synchronous LPA communities over the memoized LSH dup
    graph, every doc labeled (singletons keep their own id)."""
    from crowdsorsa_etl_spark.operators.clusters import lpa_communities
    from crowdsorsa_etl_spark.queries._shared import _lsh_pairs

    docs = _t(spark, sf_dir, "documents")
    labels = lpa_communities(
        _lsh_pairs(spark, sf_dir).select("id_a", "id_b"), rounds=_LPA_ROUNDS
    )
    sizes = labels.groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    # sizes is one row per community — broadcastable; lab is one row per
    # VERTEX in the dup graph (corpus-proportional), so the docs join must
    # stay planner-chosen (a forced broadcast would OOM the driver at the
    # scales this query is positioned for)
    lab = labels.join(F.broadcast(sizes), "label")
    return docs.join(lab, docs.doc_id == lab.id, "left").select(
        "doc_id",
        F.coalesce(F.col("label"), F.col("doc_id"))
        .cast("bigint")
        .alias("community"),
        F.coalesce(F.col("n"), F.lit(1))
        .cast("bigint")
        .alias("community_size"),
    )


# ===========================================================================
# q113_kll_quantiles — mergeable quantile sketch with a rank-error bound
# (KLL, derandomized; operators/kll.py docstring has the full contract).
# q66's histogram answers "how many per fixed bin"; the KLL cells answer
# ANY rank/quantile query within 2^max_level ranks, from O(k log(n/k))
# state. The closed form makes the whole sketch ONE distributed global
# rank (two-phase, no SinglePartition window) + 16 narrow integer
# filters; the oracle replays every cell from row_number() alone, so the
# hash gate pins the exact sketch content, not an estimate. Value domain
# is exact cents (round(l_extendedprice*100) as BIGINT) — integer state
# end to end, no float drift for the cells.
# ===========================================================================

_KLL_K = 32


def _kll_sql() -> str:
    from crowdsorsa_etl_spark.operators.kll import kll_sql

    return kll_sql(
        "SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,"
        " l_orderkey, l_linenumber FROM lineitem",
        "cents",
        "cents, l_orderkey, l_linenumber",
        k=_KLL_K,
    )


@register("q113_kll_quantiles", _kll_sql())
def q113_kll_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic KLL sketch cells over exact price cents: (level,
    pos, value, weight), sum(weight) == |lineitem| exactly."""
    from crowdsorsa_etl_spark.operators.kll import kll_cells_sorted

    li = _t(spark, sf_dir, "lineitem").select(
        F.round(F.col("l_extendedprice") * 100, 0)
        .cast("bigint")
        .alias("cents"),
        "l_orderkey",
        "l_linenumber",
    )
    return kll_cells_sorted(
        li, "cents", ["l_orderkey", "l_linenumber"], k=_KLL_K
    )


# ===========================================================================
# llm_suffix_spans_exact — the hash-free EXACT ground-truth tier for
# substring dedup (operators/suffixarray.py: Manber–Myers prefix doubling
# as DataFrame rounds + binary-lifting adjacent LCP). The production
# shingle tier (llm_substring_dedup) is token-coverage-exact only modulo
# md5 collisions; this tier compares actual tokens, so the two must agree
# span for span on any collision-free corpus — which the oracle proves
# from the OTHER side: it recomputes the spans with raw-text grams (a
# third independent algorithm), no hashes anywhere in the differential.
# Ground-truth/audit posture: the span table is a per-fixture memoized
# artifact (the _lsh_pairs discipline) — an audit tier is materialized
# per corpus snapshot, not rebuilt per probe.
# ===========================================================================

_SUFFIX_MIN_LEN = 8


def _suffix_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from crowdsorsa_etl_spark.operators.suffixarray import suffix_spans_exact

    path = os.path.join(
        _sf_cache_dir(sf_dir, "suffixspans8_v1", "documents"), "spans.parquet"
    )
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        suffix_spans_exact(
            _t(spark, sf_dir, "documents"), min_len=_SUFFIX_MIN_LEN
        ).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def _suffix_spans_sql() -> str:
    from crowdsorsa_etl_spark.operators.suffixarray import (
        suffix_spans_exact_sql,
    )

    return suffix_spans_exact_sql(_SUFFIX_MIN_LEN)


@register("llm_suffix_spans_exact", _suffix_spans_sql())
def llm_suffix_spans_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal duplicated token spans >= 8 from the suffix array + LCP —
    the exact tier that audits the md5-shingle approximation."""
    return _suffix_spans(spark, sf_dir).select(
        "doc_id", "span_start", "span_end", "n_tokens"
    )


# ===========================================================================
# llm_suffix_audit — the approximation audit the exact tier exists FOR
# (the llm_lsh_audit posture): the production md5-shingle tier at
# k in {8, 13} measured against suffix-array ground truth at L=8. The
# k=8 row is the headline invariant — miss_rate exactly 0.0 (the shingle
# tier loses NOTHING at its own k, md5 collisions would show here); the
# k=13 row quantifies what a GPT-3-style 13-gram rule leaves behind
# (spans of 8..12 duplicated tokens) — pick k from measured loss, not
# folklore. Exact BIGINT token accounting; one guarded division per row.
# ===========================================================================


def _suffix_audit_sql() -> str:
    from crowdsorsa_etl_spark.operators.suffixarray import suffix_audit_sql

    return suffix_audit_sql(_SUFFIX_MIN_LEN, (8, 13))


@register("llm_suffix_audit", _suffix_audit_sql())
def llm_suffix_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shingle-tier coverage vs suffix-array ground truth at k in {8,13}."""
    from crowdsorsa_etl_spark.operators.substring import (
        duplicated_substring_spans,
    )

    from crowdsorsa_etl_spark.queries._shared import _doc_shingles

    docs = _t(spark, sf_dir, "documents")
    exact = _suffix_spans(spark, sf_dir).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_spans_exact"),
        F.coalesce(F.sum("n_tokens"), F.lit(0))
        .cast("bigint")
        .alias("tokens_exact"),
    )
    out = None
    for k in (8, 13):
        # both shingle tiers ride their memoized per-fixture artifacts —
        # the audit's live work is the dup-count + islands only
        sh = duplicated_substring_spans(
            docs, min_run=k, shingles=_doc_shingles(spark, sf_dir, k)
        ).agg(
            F.count(F.lit(1)).cast("bigint").alias("n_spans_shingle"),
            F.coalesce(F.sum("n_tokens"), F.lit(0))
            .cast("bigint")
            .alias("tokens_shingle"),
        )
        row = (
            exact.crossJoin(sh)
            .select(
                F.lit(k).cast("int").alias("k"),
                "n_spans_exact",
                "tokens_exact",
                "n_spans_shingle",
                "tokens_shingle",
                (F.col("tokens_exact") - F.col("tokens_shingle"))
                .cast("bigint")
                .alias("missed_tokens"),
                F.when(F.col("tokens_exact") == 0, F.lit(0.0))
                .otherwise(
                    F.round(
                        (F.col("tokens_exact") - F.col("tokens_shingle"))
                        * F.lit(1.0)
                        / F.col("tokens_exact"),
                        6,
                    )
                )
                .alias("miss_rate"),
            )
        )
        out = row if out is None else out.unionAll(row)
    return out


# ===========================================================================
# q114_hll_distinct — HyperLogLog cardinality sketch over lineitem
# l_orderkey: completes the mergeable-sketch triad (q92_countmin =
# frequency, q113_kll_quantiles = quantiles, this = distinct count).
# operators/hll.py has the portability contract: md5-derived hex60 item
# hash, rho from bin()-string length (no libm log2), EXACT BIGINT
# 2^-M fold via shifts — the one-row output pins every register through
# the ordered reg_md5 chain plus the integer fold, so the hash gate
# checks the sketch cell-exactly, and est/rel_err ride one final float
# division with literal constants (the pagerank FX posture).
# ===========================================================================


def _hll_sql() -> str:
    from crowdsorsa_etl_spark.operators.hll import hll_summary_sql

    return hll_summary_sql(
        "SELECT l_orderkey FROM lineitem", "l_orderkey"
    )


@register("q114_hll_distinct", _hll_sql())
def q114_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL-256 register sketch + estimate over distinct order keys."""
    from crowdsorsa_etl_spark.operators.hll import (
        HLL_M,
        HLL_WBITS,
        hll_estimate_expr,
        hll_registers,
    )

    li = _t(spark, sf_dir, "lineitem")
    regs = hll_registers(li, "l_orderkey")
    fold = regs.agg(
        (F.lit(HLL_M) - F.count(F.lit(1))).cast("bigint").alias("v_zero"),
        (
            F.coalesce(
                # shiftleft with a COLUMN bit count needs the SQL form —
                # the python F.shiftleft only takes a literal int
                F.sum(
                    F.expr(
                        f"shiftleft(cast(1 as bigint), {HLL_WBITS + 1} - r)"
                    )
                ),
                F.lit(0),
            )
            + (F.lit(HLL_M) - F.count(F.lit(1)))
            * F.lit(1 << (HLL_WBITS + 1)).cast("bigint")
        )
        .cast("bigint")
        .alias("sum_fx"),
        F.md5(
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col("idx").alias("idx"),
                                F.concat_ws(
                                    ":",
                                    F.col("idx").cast("string"),
                                    F.col("r").cast("string"),
                                ).alias("txt"),
                            )
                        )
                    ),
                    lambda s: s["txt"],
                ),
            )
        ).alias("reg_md5"),
    )
    ex = li.agg(F.countDistinct("l_orderkey").cast("bigint").alias("n_exact"))
    est = hll_estimate_expr(F.col("sum_fx"), F.col("v_zero"))
    return fold.crossJoin(F.broadcast(ex)).select(
        F.lit(HLL_M).cast("int").alias("m"),
        "v_zero",
        "sum_fx",
        "reg_md5",
        "n_exact",
        F.round(est, 6).alias("est"),
        F.round(F.abs(est - F.col("n_exact")) / F.col("n_exact"), 6).alias(
            "rel_err"
        ),
    )


# ===========================================================================
# llm_bloom_prune — the BROADCAST shape of the decontamination probe
# (operators/bloom.py): a 4-hash/2^16-bit Bloom of the eval set's 8-gram
# window hashes, probed by every distinct corpus window — what replaces
# the corpus-side shuffle of llm_substring_decontamination's semi-join
# at 100 TB (Spark's runtime bloomFilter rewrite, rebuilt from portable
# md5 words so the oracle pins every packed 63-bit word through
# filter_md5). Reports the measured FP rate next to exact-match truth;
# n_false_neg is the structural invariant — a Bloom NEVER misses, so the
# column must be exactly 0 (and the pytest gates it).
# ===========================================================================

_BLOOM_SHINGLE_K = 8


def _bloom_sql() -> str:
    from crowdsorsa_etl_spark.operators.bloom import bloom_prune_sql
    from crowdsorsa_etl_spark.operators.substring import _NORM

    k = _BLOOM_SHINGLE_K

    def keys(pred: str) -> str:
        return f"""
        SELECT DISTINCT md5(array_to_string(
                 arr[CAST(i AS INT):CAST(i + {k} - 1 AS INT)], ' ')) AS s
        FROM (SELECT doc_id, string_split({_NORM}, ' ') AS arr
              FROM documents WHERE {pred}) toks,
             UNNEST(range(1, len(arr) - {k} + 2)) AS t(i)
        """

    return bloom_prune_sql(keys("doc_id % 10 = 0"), keys("doc_id % 10 != 0"))


@register("llm_bloom_prune", _bloom_sql())
def llm_bloom_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom prune audit: eval-window filter vs distinct corpus windows,
    exact FP accounting, zero false negatives by construction."""
    from crowdsorsa_etl_spark.operators.bloom import (
        BLOOM_K,
        bloom_build,
        bloom_probe,
    )
    from crowdsorsa_etl_spark.queries._shared import _doc_shingles

    sh = _doc_shingles(spark, sf_dir, _BLOOM_SHINGLE_K)
    ek = (
        sh.filter(F.col("doc_id") % 10 == 0).select("sh").distinct()
        .withColumnRenamed("sh", "s")
    )
    pk = (
        sh.filter(F.col("doc_id") % 10 != 0).select("sh").distinct()
        .withColumnRenamed("sh", "s")
    )
    flt = bloom_build(ek)
    fchain = flt.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_words"),
        F.md5(
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col("word").alias("word"),
                                F.concat_ws(
                                    ":",
                                    F.col("word").cast("string"),
                                    F.col("bits").cast("string"),
                                ).alias("txt"),
                            )
                        )
                    ),
                    lambda s: s["txt"],
                ),
            )
        ).alias("filter_md5"),
    )
    probed = bloom_probe(pk, flt).join(
        ek.withColumn("truth", F.lit(True)), "s", "left"
    ).select(
        "s", "bloom_pass", F.coalesce(F.col("truth"), F.lit(False)).alias("truth")
    )
    agg = probed.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_probes"),
        F.sum(F.col("bloom_pass").cast("int")).cast("bigint").alias("n_pass"),
        F.sum(F.col("truth").cast("int")).cast("bigint").alias("n_true"),
        F.sum((F.col("bloom_pass") & ~F.col("truth")).cast("int"))
        .cast("bigint")
        .alias("n_false_pos"),
        F.sum((F.col("truth") & ~F.col("bloom_pass")).cast("int"))
        .cast("bigint")
        .alias("n_false_neg"),
    )
    return fchain.crossJoin(F.broadcast(agg)).select(
        "n_words",
        "filter_md5",
        "n_probes",
        "n_pass",
        "n_true",
        "n_false_pos",
        "n_false_neg",
        F.when(F.col("n_probes") - F.col("n_true") == 0, F.lit(0.0))
        .otherwise(
            F.round(
                F.col("n_false_pos")
                * F.lit(1.0)
                / (F.col("n_probes") - F.col("n_true")),
                6,
            )
        )
        .alias("fp_rate"),
    )


# ===========================================================================
# q115_hll_windows — sketches x event time: per-day HLL of distinct
# active users over events, PLUS the rollup row proving mergeability
# in-query: the month row's registers are the per-register max of the
# 30 daily sketches AND must chain-hash identical to a direct
# whole-range sketch (merged_eq_direct pinned TRUE by the oracle). This
# is the shape a 100 TB metrics pipeline stores — daily register tables,
# any ad-hoc range answered by max-merge, never a re-scan. Daily
# cardinalities sit in HLL's linear-counting regime (V > 0, raw E <=
# 2.5m) — the LC branch selects on exact integers so both engines take
# the same branch; ln() is the one float, absorbed by 6-dp rounding.
# ===========================================================================


def _hll_windows_sql() -> str:
    from crowdsorsa_etl_spark.operators.hll import (
        hll_est_case_sql,
        hll_fold_sql,
        hll_registers_sql,
    )

    from crowdsorsa_etl_spark.functions.portable_hash import hex60_sql
    from crowdsorsa_etl_spark.operators.hll import HLL_WBITS

    day = "strftime(date_trunc('day', ts), '%Y-%m-%d')"
    est = hll_est_case_sql("f.sum_fx", "f.v_zero")
    direct = hll_registers_sql("SELECT user_id FROM events", "user_id")
    pow_w = 1 << HLL_WBITS
    h = hex60_sql("'hll:v1:' || CAST(user_id AS VARCHAR)")
    return f"""
    WITH ev AS MATERIALIZED (SELECT {day} AS day, user_id FROM events),
    hr AS MATERIALIZED (
      SELECT day, CAST(h // {pow_w} AS INT) AS idx,
             CAST(max(CASE WHEN h % {pow_w} = 0 THEN {HLL_WBITS + 1}
                      ELSE {HLL_WBITS} - length(bin(h % {pow_w})) + 1
                      END) AS INT) AS r
      FROM (SELECT day, {h} AS h FROM ev)
      GROUP BY 1, 2
    ),
    dayfold AS ({hll_fold_sql("hr", "day")}),
    dayexact AS (
      SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
      FROM ev GROUP BY day
    ),
    merged AS (SELECT idx, max(r) AS r FROM hr GROUP BY idx),
    mergedfold AS ({hll_fold_sql("merged")}),
    direct AS ({direct}),
    directfold AS ({hll_fold_sql("direct")}),
    allexact AS (
      SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact FROM ev
    )
    SELECT day, x.n_exact, f.v_zero,
           round({est}, 6) AS est,
           round(abs({est} - x.n_exact) / x.n_exact, 6) AS rel_err,
           f.reg_md5,
           CAST(NULL AS BOOLEAN) AS merged_eq_direct
    FROM dayfold f JOIN dayexact x USING (day)
    UNION ALL
    SELECT 'ALL' AS day, x.n_exact, f.v_zero,
           round({est}, 6) AS est,
           round(abs({est} - x.n_exact) / x.n_exact, 6) AS rel_err,
           f.reg_md5,
           (f.reg_md5 = (SELECT reg_md5 FROM directfold)) AS merged_eq_direct
    FROM mergedfold f, allexact x
    """


@register("q115_hll_windows", _hll_windows_sql())
def q115_hll_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day HLL distinct-user sketches + the max-merged month rollup
    hash-verified against a direct whole-range sketch."""
    from crowdsorsa_etl_spark.functions.portable_hash import hex60_spark
    from crowdsorsa_etl_spark.operators.hll import (
        HLL_M,
        HLL_WBITS,
        hll_estimate_expr,
        hll_registers,
    )

    ev = _t(spark, sf_dir, "events").select(
        F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias(
            "day"
        ),
        "user_id",
    )
    h = hex60_spark(F.concat(F.lit("hll:v1:"), F.col("user_id").cast("string")))
    pow_w = 1 << HLL_WBITS
    hashed = ev.select("day", h.alias("_h")).select(
        "day",
        F.expr(f"_h div {pow_w}").cast("int").alias("idx"),
        (F.col("_h") % F.lit(pow_w)).alias("_w"),
    )
    rho = (
        F.when(F.col("_w") == 0, HLL_WBITS + 1)
        .otherwise(F.lit(HLL_WBITS) - F.length(F.bin(F.col("_w"))) + 1)
        .cast("int")
    )
    hr = (
        hashed.select("day", "idx", rho.alias("_rho"))
        .groupBy("day", "idx")
        .agg(F.max("_rho").cast("int").alias("r"))
    )

    def fold(regs: DataFrame, keys: list[str]) -> DataFrame:
        gb = regs.groupBy(*keys) if keys else regs.groupBy()
        return gb.agg(
            (F.lit(HLL_M) - F.count(F.lit(1))).cast("bigint").alias("v_zero"),
            (
                F.coalesce(
                    F.sum(
                        F.expr(
                            f"shiftleft(cast(1 as bigint), {HLL_WBITS + 1} - r)"
                        )
                    ),
                    F.lit(0),
                )
                + (F.lit(HLL_M) - F.count(F.lit(1)))
                * F.lit(1 << (HLL_WBITS + 1)).cast("bigint")
            )
            .cast("bigint")
            .alias("sum_fx"),
            F.md5(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.struct(
                                    F.col("idx").alias("idx"),
                                    F.concat_ws(
                                        ":",
                                        F.col("idx").cast("string"),
                                        F.col("r").cast("string"),
                                    ).alias("txt"),
                                )
                            )
                        ),
                        lambda s: s["txt"],
                    ),
                )
            ).alias("reg_md5"),
        )

    est = hll_estimate_expr(F.col("sum_fx"), F.col("v_zero"))
    dayfold = fold(hr, ["day"])
    dayexact = ev.groupBy("day").agg(
        F.countDistinct("user_id").cast("bigint").alias("n_exact")
    )
    day_rows = dayfold.join(dayexact, "day").select(
        "day",
        "n_exact",
        "v_zero",
        F.round(est, 6).alias("est"),
        F.round(F.abs(est - F.col("n_exact")) / F.col("n_exact"), 6).alias(
            "rel_err"
        ),
        "reg_md5",
        F.lit(None).cast("boolean").alias("merged_eq_direct"),
    )
    merged = hr.groupBy("idx").agg(F.max("r").cast("int").alias("r"))
    mergedfold = fold(merged, [])
    directfold = fold(hll_registers(ev, "user_id"), []).select(
        F.col("reg_md5").alias("_direct_md5")
    )
    allexact = ev.agg(
        F.countDistinct("user_id").cast("bigint").alias("n_exact")
    )
    all_row = (
        mergedfold.crossJoin(F.broadcast(allexact))
        .crossJoin(F.broadcast(directfold))
        .select(
            F.lit("ALL").alias("day"),
            "n_exact",
            "v_zero",
            F.round(est, 6).alias("est"),
            F.round(
                F.abs(est - F.col("n_exact")) / F.col("n_exact"), 6
            ).alias("rel_err"),
            "reg_md5",
            (F.col("reg_md5") == F.col("_direct_md5")).alias(
                "merged_eq_direct"
            ),
        )
    )
    return day_rows.unionAll(all_row)


# ===========================================================================
# q116_kll_grouped — one KLL sketch PER GROUP (l_returnflag): the
# per-domain quantile table a curation pipeline materializes (length
# quantiles per source, score quantiles per language) — q113's closed
# form with the stream length m carried as the group-size COLUMN, and
# ranking a group-PARTITIONED window (parallel across groups, no global
# sort at all). Cells are hash-pinned per group; weights conserve the
# group sizes exactly.
# ===========================================================================


def _kll_grouped_sql() -> str:
    from crowdsorsa_etl_spark.operators.kll import kll_grouped_sql

    return kll_grouped_sql(
        "SELECT l_returnflag, CAST(round(l_extendedprice * 100) AS BIGINT)"
        " AS cents, l_orderkey, l_linenumber FROM lineitem",
        "l_returnflag",
        "cents",
        "cents, l_orderkey, l_linenumber",
        k=_KLL_K,
    )


@register("q116_kll_grouped", _kll_grouped_sql())
def q116_kll_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-return-flag KLL sketch cells over exact price cents."""
    from crowdsorsa_etl_spark.operators.kll import kll_cells_grouped

    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100, 0)
        .cast("bigint")
        .alias("cents"),
        "l_orderkey",
        "l_linenumber",
    )
    return kll_cells_grouped(
        li, ["l_returnflag"], "cents", ["l_orderkey", "l_linenumber"], k=_KLL_K
    ).withColumnRenamed("l_returnflag", "grp")


# ===========================================================================
# llm_jl_transform — Johnson–Lindenstrauss random projection 64 -> 16
# with its distortion MEASURED in-query (the fp_rate/suffix-audit
# posture: an approximation ships with its loss). The Rademacher sign
# matrix is a pure function of (seed, k, j) computed DRIVER-side and
# embedded as literals in BOTH plans (the pagerank-constants posture) —
# no per-row hashing; the projection itself is row-local arithmetic that
# stays in whole-stage codegen, which is what makes JL the cheap first
# stage of an embedding pipeline at 100 TB (16/64ths the bytes into
# every downstream shuffle). 120 probe pairs: exact cosine in original
# vs projected space, 6-dp rounded (the proven float-parity discipline).
# ===========================================================================

_JL_IN, _JL_OUT = 64, 16
_JL_PAIR_IDS = 16


def _jl_signs() -> list[list[int]]:
    import hashlib

    return [
        [
            1
            - 2
            * (
                int(
                    hashlib.md5(f"jl:v1:{k}:{j}".encode()).hexdigest()[:15],
                    16,
                )
                % 2
            )
            for j in range(_JL_IN)
        ]
        for k in range(_JL_OUT)
    ]


def _jl_sql() -> str:
    signs = _jl_signs()
    import math

    inv = 1.0 / math.sqrt(_JL_OUT)
    comps = ", ".join(
        f"list_dot_product(v, CAST({signs[k]} AS DOUBLE[])) * {inv!r}"
        for k in range(_JL_OUT)
    )
    cos = (
        "round(list_dot_product({a}, {b})"
        " / (sqrt(list_dot_product({a}, {a}))"
        " * sqrt(list_dot_product({b}, {b}))), 6)"
    )
    return f"""
    WITH e AS (
      SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
      FROM embeddings WHERE vec_id < {_JL_PAIR_IDS}
    ),
    p AS (SELECT id, v, [{comps}] AS y FROM e)
    SELECT a.id AS id_a, b.id AS id_b,
           {cos.format(a="a.v", b="b.v")} AS cos_orig,
           {cos.format(a="a.y", b="b.y")} AS cos_proj,
           round(abs({cos.format(a="a.v", b="b.v")}
                     - {cos.format(a="a.y", b="b.y")}), 6) AS abs_err
    FROM p a JOIN p b ON a.id < b.id
    """


@register("llm_jl_transform", _jl_sql())
def llm_jl_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JL 64->16 Rademacher projection; per-pair cosine distortion."""
    import math

    signs = _jl_signs()
    inv = 1.0 / math.sqrt(_JL_OUT)
    emb = (
        _t(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < _JL_PAIR_IDS)
        .select(
            F.col("vec_id").alias("id"),
            F.col("embedding").cast("array<double>").alias("v"),
        )
    )

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    y = F.array(
        *[
            (
                dot(
                    F.col("v"),
                    F.array(*[F.lit(float(s)) for s in signs[k]]),
                )
                * F.lit(inv)
            )
            for k in range(_JL_OUT)
        ]
    )
    p = emb.select("id", "v", y.alias("y"))
    a = p.select(
        F.col("id").alias("id_a"), F.col("v").alias("va"), F.col("y").alias("ya")
    )
    b = p.select(
        F.col("id").alias("id_b"), F.col("v").alias("vb"), F.col("y").alias("yb")
    )

    def cos(x, z):
        return F.round(
            dot(F.col(x), F.col(z))
            / (F.sqrt(dot(F.col(x), F.col(x))) * F.sqrt(dot(F.col(z), F.col(z)))),
            6,
        )

    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            cos("va", "vb").alias("cos_orig"),
            cos("ya", "yb").alias("cos_proj"),
            F.round(F.abs(cos("va", "vb") - cos("ya", "yb")), 6).alias(
                "abs_err"
            ),
        )
    )


# ===========================================================================
# llm_hll_setops — sketch ALGEBRA on HLL registers: union is native
# (per-register max, exact in sketch space), intersection is
# inclusion-exclusion est(A)+est(B)-est(A∪B) — the standard trick and
# its standard caveat (errors COMPOUND: the intersection estimate's
# relative error scales with |A∪B|/|A∩B|, not 1.04/√m), so the query
# ships the measured error next to exact truth (the fp_rate posture).
# A = buyers (event_type 'purchase'-ish: first type by name), B =
# another type's users; at 100 TB this is the audience-overlap question
# answered from two O(m)-byte register tables instead of a key shuffle.
# ===========================================================================


def _hll_setops_sql() -> str:
    from crowdsorsa_etl_spark.operators.hll import (
        hll_est_case_sql,
        hll_fold_sql,
        hll_registers_sql,
    )

    est = hll_est_case_sql("f.sum_fx", "f.v_zero")

    def regs(name: str, pred: str) -> str:
        return f"""{name} AS MATERIALIZED (
        {hll_registers_sql(f"SELECT user_id FROM events WHERE {pred}", "user_id")}
        )"""

    tmin = "(SELECT min(event_type) FROM events)"
    tmax = "(SELECT max(event_type) FROM events)"
    return f"""
    WITH {regs("ra", f"event_type = {tmin}")},
    {regs("rb", f"event_type = {tmax}")},
    ru AS (
      SELECT idx, max(r) AS r
      FROM (SELECT * FROM ra UNION ALL SELECT * FROM rb) GROUP BY idx
    ),
    fa AS ({hll_fold_sql("ra")}), fb AS ({hll_fold_sql("rb")}),
    fu AS ({hll_fold_sql("ru")}),
    ea AS (SELECT round({est.replace("f.", "fa.")}, 6) AS est_a FROM fa),
    eb AS (SELECT round({est.replace("f.", "fb.")}, 6) AS est_b FROM fb),
    eu AS (SELECT round({est.replace("f.", "fu.")}, 6) AS est_union FROM fu),
    ex AS (
      SELECT CAST(count(DISTINCT CASE WHEN event_type = {tmin}
                                      THEN user_id END) AS BIGINT) AS n_a,
             CAST(count(DISTINCT CASE WHEN event_type = {tmax}
                                      THEN user_id END) AS BIGINT) AS n_b,
             CAST(count(DISTINCT CASE WHEN event_type IN
                    ({tmin}, {tmax}) THEN user_id END) AS BIGINT) AS n_union
      FROM events
    ),
    ix AS (
      SELECT CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_inter
      FROM (SELECT DISTINCT user_id FROM events WHERE event_type = {tmin}) a
      JOIN (SELECT DISTINCT user_id FROM events WHERE event_type = {tmax}) b
        ON a.user_id = b.user_id
    )
    SELECT ex.n_a, ex.n_b, ex.n_union, ix.n_inter,
           ea.est_a, eb.est_b, eu.est_union,
           round(ea.est_a + eb.est_b - eu.est_union, 6) AS est_inter,
           round(abs(ea.est_a + eb.est_b - eu.est_union - ix.n_inter)
                 / greatest(ix.n_inter, 1), 6) AS inter_rel_err
    FROM ex, ix, ea, eb, eu
    """


@register("llm_hll_setops", _hll_setops_sql())
def llm_hll_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL set algebra: native union (register max) + inclusion-exclusion
    intersection, with its compounded error measured against truth."""
    from crowdsorsa_etl_spark.operators.hll import (
        HLL_M,
        HLL_WBITS,
        hll_estimate_expr,
        hll_registers,
    )

    ev = _t(spark, sf_dir, "events").select("event_type", "user_id")
    bounds = ev.agg(
        F.min("event_type").alias("tmin"), F.max("event_type").alias("tmax")
    ).collect()[0]
    tmin, tmax = bounds["tmin"], bounds["tmax"]
    a = ev.filter(F.col("event_type") == tmin).select("user_id")
    b = ev.filter(F.col("event_type") == tmax).select("user_id")
    ra = hll_registers(a, "user_id")
    rb = hll_registers(b, "user_id")
    ru = ra.unionAll(rb).groupBy("idx").agg(F.max("r").cast("int").alias("r"))

    def fold_est(regs: DataFrame, name: str) -> DataFrame:
        fold = regs.agg(
            (F.lit(HLL_M) - F.count(F.lit(1))).cast("bigint").alias("v_zero"),
            (
                F.coalesce(
                    F.sum(
                        F.expr(
                            f"shiftleft(cast(1 as bigint), {HLL_WBITS + 1} - r)"
                        )
                    ),
                    F.lit(0),
                )
                + (F.lit(HLL_M) - F.count(F.lit(1)))
                * F.lit(1 << (HLL_WBITS + 1)).cast("bigint")
            )
            .cast("bigint")
            .alias("sum_fx"),
        )
        return fold.select(
            F.round(
                hll_estimate_expr(F.col("sum_fx"), F.col("v_zero")), 6
            ).alias(name)
        )

    ex = ev.agg(
        F.countDistinct(
            F.when(F.col("event_type") == tmin, F.col("user_id"))
        )
        .cast("bigint")
        .alias("n_a"),
        F.countDistinct(
            F.when(F.col("event_type") == tmax, F.col("user_id"))
        )
        .cast("bigint")
        .alias("n_b"),
        F.countDistinct(
            F.when(
                F.col("event_type").isin([tmin, tmax]), F.col("user_id")
            )
        )
        .cast("bigint")
        .alias("n_union"),
    )
    ix = (
        a.distinct()
        .join(b.distinct(), "user_id")
        .agg(F.countDistinct("user_id").cast("bigint").alias("n_inter"))
    )
    out = (
        ex.crossJoin(F.broadcast(ix))
        .crossJoin(F.broadcast(fold_est(ra, "est_a")))
        .crossJoin(F.broadcast(fold_est(rb, "est_b")))
        .crossJoin(F.broadcast(fold_est(ru, "est_union")))
    )
    inter = F.col("est_a") + F.col("est_b") - F.col("est_union")
    return out.select(
        "n_a",
        "n_b",
        "n_union",
        "n_inter",
        "est_a",
        "est_b",
        "est_union",
        F.round(inter, 6).alias("est_inter"),
        F.round(
            F.abs(inter - F.col("n_inter"))
            / F.greatest(F.col("n_inter"), F.lit(1)),
            6,
        ).alias("inter_rel_err"),
    )
