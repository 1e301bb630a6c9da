"""Round 7: lexical retrieval (BM25), training-chunk materialization, and a
runtime-bloom-filter join demonstration.

Registration ORDER is load-bearing (the driver's correctness window samples
the first 50 registrations); this module is imported LAST by
queries/__init__.py, so its entries append after q95.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from crowdsorsa_etl_spark.queries._shared import _NORM_SQL, _t, register

from crowdsorsa_etl_spark.functions.text import normalize_text as _norm


# ===========================================================================
# llm_bm25_topk — Okapi BM25 lexical retrieval over the documents corpus.
#
# The standard lexical tier of a training-data pipeline: decontamination
# sweeps, eval-set retrieval, and quality-weighted sampling all need a
# scalable "top documents for this query" primitive that doesn't require
# embeddings. Formula: Lucene BM25 (k1 = 1.2, b = 0.75,
# idf = ln(1 + (N − df + 0.5)/(df + 0.5))).
#
# Shuffle shape (the one you'd want at 100 TB): tokenize → ONE shuffle for
# (doc, term) postings; doc lengths fold from postings with a partial agg;
# corpus stats (N, avgdl) are a lazy 1-row broadcast; the query-term table
# broadcasts, so df and scoring touch only postings rows whose term is in a
# query (predicate pushdown through the broadcast join). No corpus re-scan,
# no all-pairs anything.
#
# Float-parity design for the oracle: per-term contributions round to 6 dp
# BEFORE the per-(query,doc) sum, so both engines sum identical multiples of
# 1e-6 and the re-rounded total is engine-independent regardless of
# summation order; ln/÷ inputs are bit-identical doubles (glibc on both).
# ===========================================================================

_BM25_QUERIES: list[tuple[int, str]] = [
    (1, "hash join"),
    (2, "window agg stream"),
    (3, "slow scan filter"),
]
_BM25_K = 10

_BM25_TERMS = sorted({t for _, q in _BM25_QUERIES for t in q.split()})
_BM25_CONTRIB_SQL = (
    "round(ln(1.0 + (CAST(n_docs AS DOUBLE) - df + 0.5) / (df + 0.5))"
    " * (tf * 2.2) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)), 6)"
)

_BM25_ORACLE_SQL = f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split({_NORM_SQL}, ' ')) AS t
      FROM documents
    ),
    postings AS (
      SELECT doc_id, t, CAST(count(*) AS BIGINT) AS tf
      FROM toks GROUP BY doc_id, t
    ),
    dlen AS (
      SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM postings GROUP BY doc_id
    ),
    stats AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs, avg(dl) AS avgdl FROM dlen
    ),
    q(query_id, t) AS (VALUES {", ".join(f"({i}, '{t}')" for i, s in _BM25_QUERIES for t in s.split())}),
    dft AS (
      SELECT t, CAST(count(*) AS BIGINT) AS df
      FROM postings
      WHERE t IN ({", ".join(f"'{t}'" for t in _BM25_TERMS)})
      GROUP BY t
    ),
    contrib AS (
      SELECT q.query_id, p.doc_id, {_BM25_CONTRIB_SQL} AS c
      FROM postings p
      JOIN q ON p.t = q.t
      JOIN dft ON p.t = dft.t
      JOIN dlen ON p.doc_id = dlen.doc_id
      CROSS JOIN stats
    ),
    scores AS (
      SELECT query_id, doc_id, round(sum(c), 6) AS bm25
      FROM contrib GROUP BY query_id, doc_id
    )
    SELECT CAST(query_id AS INT) AS query_id, doc_id, bm25, rank
    FROM (SELECT *, CAST(row_number() OVER (
               PARTITION BY query_id ORDER BY bm25 DESC, doc_id ASC) AS INT)
               AS rank
          FROM scores)
    WHERE rank <= {_BM25_K}
"""


@register("llm_bm25_topk", _BM25_ORACLE_SQL)
def llm_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 documents per query under Lucene-style BM25, full hash oracle
    (see the block comment above for the scale shape and float-parity
    conventions). Round 8: runs through the shared operators/bm25 core —
    the literal queries become a 3-row query TABLE (the generalized input
    contract; llm_bm25_querytable / llm_bm25_incremental exercise the
    derived-table and index-at-rest forms)."""
    from crowdsorsa_etl_spark.operators.bm25 import bm25_topk

    docs = _t(spark, sf_dir, "documents")
    qdf = spark.createDataFrame(_BM25_QUERIES, "query_id int, text string")
    return bm25_topk(docs, qdf, k=_BM25_K)


# ===========================================================================
# llm_doc_chunking — fixed-window training-chunk materialization.
#
# The step between curation and tokenization: long documents become
# fixed-size token windows with overlap (here 64-token chunks, stride 48 →
# 16-token overlap), keeping the short tail chunk. Pure column expressions:
# split once, sequence() the starts, posexplode, slice — whole-stage
# codegen'd, no Python, one narrow stage (chunking is embarrassingly
# parallel; output rows ≈ tokens/stride per doc).
# ===========================================================================

_CHUNK_SIZE = 64
_CHUNK_STRIDE = 48


@register(
    "llm_doc_chunking",
    f"""
    WITH base AS (
      SELECT doc_id, string_split({_NORM_SQL}, ' ') AS toks
      FROM documents WHERE length(trim(text)) > 0
    ),
    sized AS (
      SELECT doc_id, toks, len(toks) AS n,
             range(0, len(toks), {_CHUNK_STRIDE}) AS starts
      FROM base
    )
    SELECT doc_id,
           CAST(generate_subscripts(starts, 1) - 1 AS INT) AS chunk_idx,
           CAST(unnest(starts) AS INT) AS start_token,
           CAST(least({_CHUNK_SIZE}, n - unnest(starts)) AS INT) AS n_tokens,
           array_to_string(
             toks[unnest(starts) + 1 :
                  least(unnest(starts) + {_CHUNK_SIZE}, n)], ' ') AS chunk_text
    FROM sized
    """,
)
def llm_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-window chunks per document (64/48), hash-oracled
    including the chunk text itself (shared grid: operators/chunking)."""
    from crowdsorsa_etl_spark.operators.chunking import chunk_documents

    docs = _t(spark, sf_dir, "documents")
    return chunk_documents(
        docs, size=_CHUNK_SIZE, stride=_CHUNK_STRIDE
    )


# ===========================================================================
# q96_bloom_join_reduction — Spark's runtime bloom-filter join (SPARK-32268).
#
# At 100 TB the classic "fact ⋈ selectively-filtered side" join wastes the
# whole fact shuffle on rows that can never match. Spark's InjectRuntimeFilter
# builds a bloom filter from the filtered (creation) side and semi-reduces
# the fact (application) side BEFORE its shuffle — exactly the win a manual
# bloom pre-join would buy, declared instead of hand-built.
#
# Spark only injects it when the creation side is too big to broadcast
# (otherwise a broadcast join already avoids the fact shuffle) — true at
# cluster scale, never at test-fixture scale. The query therefore scopes
# {broadcast off, bloom on} around its own materialization (localCheckpoint
# runs the bloom plan inside the scope) and restores the session confs, so
# no other query's plan is perturbed. The plan assertion lives in
# tests/test_plans.py; the oracle is the plain join semantics (the filter is
# semantics-preserving by construction — that is what the hash match proves).
# ===========================================================================


def _bloom_join_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
        )
    )


_BLOOM_CONFS = {
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    # fixture scans are MBs; the 10 GB default models a real cluster
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "1b",
    # force the shuffle join the rule targets (at 100 TB the filtered side
    # exceeds the broadcast threshold on its own)
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    # let the rule fire at scaled local fixtures too: the default 10 MB
    # creation-side cap declined the filter at the 100x spot-bench (the
    # filtered orders build side is still bloom-sized in KEYS, which is
    # what matters; the cap models executor memory, not correctness)
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "1GB",
}


def _scoped_confs(spark: SparkSession, confs: dict[str, str]):
    saved = {}
    for k, v in confs.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:  # noqa: BLE001 — unset conf
            saved[k] = None
        spark.conf.set(k, v)
    return saved


def _restore_confs(spark: SparkSession, saved: dict[str, str | None]) -> None:
    for k, v in saved.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


@register(
    "q96_bloom_join_reduction",
    """
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
           round(sum(l_extendedprice), 2) AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_totalprice > 400000
    GROUP BY o_orderpriority
    """,
)
def q96_bloom_join_reduction(spark: SparkSession, sf_dir: str) -> DataFrame:
    saved = _scoped_confs(spark, _BLOOM_CONFS)
    try:
        df = _bloom_join_plan(spark, sf_dir)
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        if "might_contain" not in plan:
            raise AssertionError(
                "runtime bloom filter was not injected — the query exists to "
                "exercise that plan; check the scoped confs"
            )
        return df.localCheckpoint()  # materialize INSIDE the conf scope
    finally:
        _restore_confs(spark, saved)


# ===========================================================================
# llm_pq_topk — product quantization ANN (see operators/pq.py docstring for
# the compression arithmetic and the determinism contract that makes the
# full k-means-replay oracle possible).
# ===========================================================================

from crowdsorsa_etl_spark import lsh_oracles


@register(
    "llm_pq_topk",
    lsh_oracles.pq_topk_sql(
        dim=64, m=8, k_codes=64, k=5, candidate_margin=32,
        sample_size=2048, iterations=4, query_pred="id < 10",
    ),
)
def llm_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ/ADC approximate top-k with exact re-rank, fully hash-oracled:
    DuckDB replays the per-subspace k-means (long-format unrolled Lloyd
    iterations), the corpus encoding, the 6-dp distance tables, the ADC
    candidate ranking, and the sequential-cosine re-score."""
    from crowdsorsa_etl_spark.operators.pq import pq_topk

    emb = _t(spark, sf_dir, "embeddings")
    return pq_topk(
        emb, emb.filter(F.col("vec_id") < 10),
        k=5, m=8, k_codes=64, candidate_margin=32,
        sample_size=2048, iterations=4,
    )


# ===========================================================================
# geo_spatial_join — grid-bucketed point-in-polygon join over the season
# fixture polygons (see operators/spatial.py for the plan shape). The oracle
# is the ALL-PAIRS semantic ground truth, so the hash gate proves both the
# ray-cast verify and that the cell prefilter loses/invents nothing.
# ===========================================================================


from crowdsorsa_etl_spark import parity_oracles as _po


@register("geo_spatial_join", _po.spatial_join_sql())
def geo_spatial_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probe points (envelope centers = inside; shifted = outside) against
    the 2024 observation polygons through the grid-cell spatial join."""
    from crowdsorsa_etl_spark import parity_oracles
    from crowdsorsa_etl_spark.functions.geo import st_envelope
    from crowdsorsa_etl_spark.operators.spatial import grid_spatial_join
    from crowdsorsa_etl_spark.schemas import OBSERVATIONS_2024

    d = parity_oracles.ensure_observation_fixtures()
    polys = (
        spark.read.schema(OBSERVATIONS_2024)
        .parquet(f"{d}/observations_2024.parquet")
        .select(F.col("tunniste").alias("poly_id"), "geometry_wkb")
    )
    env = polys.select("poly_id", st_envelope(F.col("geometry_wkb")).alias("e"))
    pts = env.select(
        F.explode(
            F.array(
                F.struct(
                    F.concat(F.col("poly_id"), F.lit("_in")).alias("point_id"),
                    ((F.col("e.xmin") + F.col("e.xmax")) / 2.0).alias("x"),
                    ((F.col("e.ymin") + F.col("e.ymax")) / 2.0).alias("y"),
                ),
                F.struct(
                    F.concat(F.col("poly_id"), F.lit("_out")).alias("point_id"),
                    (
                        F.col("e.xmax") + (F.col("e.xmax") - F.col("e.xmin")) + 1.0
                    ).alias("x"),
                    ((F.col("e.ymin") + F.col("e.ymax")) / 2.0).alias("y"),
                ),
            )
        ).alias("p")
    ).select("p.*")
    return grid_spatial_join(pts, polys, cell_size=1000.0)


# ===========================================================================
# q97_scd2_versions — SCD2 dimension build from the events change log (see
# operators/scd.py). Tracked attribute: the user's event_type; versions
# collapse consecutive equal types and carry validity intervals.
# ===========================================================================


@register(
    "q97_scd2_versions",
    """
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER w AS prev,
             lag(ts) OVER w AS prev_ts
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    changes AS (
      SELECT user_id, event_type, ts, event_id FROM ordered
      WHERE prev_ts IS NULL OR event_type IS DISTINCT FROM prev
    )
    SELECT user_id, event_type,
           valid_from, valid_to,
           CAST(version AS INT) AS version,
           valid_to IS NULL AS is_current
    FROM (SELECT user_id, event_type, ts AS valid_from,
                 lead(ts) OVER wv AS valid_to,
                 row_number() OVER wv AS version
          FROM changes
          WINDOW wv AS (PARTITION BY user_id ORDER BY ts, event_id)) t
    """,
)
def q97_scd2_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-history SCD2 over (user_id, event_type) with a hash oracle:
    version numbering, validity intervals, and the is_current flag are all
    replayed by DuckDB windows with the identical (ts, event_id) order."""
    from crowdsorsa_etl_spark.operators.scd import scd2_build

    events = _t(spark, sf_dir, "events")
    return scd2_build(
        events,
        key_cols=["user_id"],
        ts_col="ts",
        tracked_cols=["event_type"],
        tie_break_cols=["event_id"],
    ).select(
        "user_id", "event_type", "valid_from", "valid_to", "version", "is_current"
    )


@register(
    "q98_scd2_asof_lookup",
    """
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER w AS prev,
             lag(ts) OVER w AS prev_ts
      FROM events WHERE event_type != 'purchase'
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    changes AS (
      SELECT user_id, event_type, ts, event_id FROM ordered
      WHERE prev_ts IS NULL OR event_type IS DISTINCT FROM prev
    ),
    versions AS (
      SELECT user_id, event_type AS status_at_purchase, ts AS valid_from,
             lead(ts) OVER wv AS valid_to
      FROM changes
      WINDOW wv AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT e.event_id, e.user_id, e.ts, v.status_at_purchase
    FROM events e
    JOIN versions v
      ON e.user_id = v.user_id
     AND v.valid_from <= e.ts
     AND (v.valid_to IS NULL OR e.ts < v.valid_to)
    WHERE e.event_type = 'purchase'
    """,
)
def q98_scd2_asof_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal point-lookup against the SCD2 dimension: for every purchase
    event, the BROWSING status (the dimension is built from non-purchase
    events) the user was in at that instant — the composition the
    validity-interval layout exists for. Equi-join on the key co-locates
    each event with its user's few versions; the interval predicate then
    filters locally (never a blind range join across users)."""
    from crowdsorsa_etl_spark.operators.scd import scd2_build

    events = _t(spark, sf_dir, "events")
    versions = scd2_build(
        events.filter(F.col("event_type") != "purchase"),
        key_cols=["user_id"],
        ts_col="ts",
        tracked_cols=["event_type"],
        tie_break_cols=["event_id"],
    ).select(
        "user_id",
        F.col("event_type").alias("status_at_purchase"),
        "valid_from",
        "valid_to",
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    return (
        purchases.join(versions, "user_id")
        .filter(
            (F.col("valid_from") <= F.col("ts"))
            & (F.col("valid_to").isNull() | (F.col("ts") < F.col("valid_to")))
        )
        .select("event_id", "user_id", "ts", "status_at_purchase")
    )


# ===========================================================================
# llm_fuzzy_decontamination — cross-corpus banded MinHash-LSH against an
# eval/probe set, exact-Jaccard verified. Exact n-gram contamination sweeps
# (llm_contamination) miss paraphrases; signature-collision candidates catch
# near-verbatim leakage, and the Jaccard verify bounds false positives. The
# probe set broadcasts, so the corpus's only shuffle is its signature build.
# ===========================================================================


@register(
    "llm_fuzzy_decontamination",
    lsh_oracles.fuzzy_decontamination_sql(
        corpus_pred="id % 20 != 0", probe_pred="id % 20 = 0", threshold=0.5
    ),
)
def llm_fuzzy_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus docs near-duplicating any eval-set doc (doc_id % 20 == 0
    plays the eval set), with band-collision count and exact token-set
    Jaccard ≥ 0.5; fully hash-oracled via the portable-hash tier."""
    from crowdsorsa_etl_spark.operators.dedup import (
        jaccard_verify_pairs,
        minhash_lsh_candidates_cross,
    )

    docs = _t(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 20 != 0)
    probe = docs.filter(F.col("doc_id") % 20 == 0)
    cand = minhash_lsh_candidates_cross(corpus, probe, portable=True)
    return jaccard_verify_pairs(cand, docs, threshold=0.5).select(
        F.col("id_a").alias("doc_id"),
        F.col("id_b").alias("eval_id"),
        "n_bands_matched",
        "jaccard",
    )


@register(
    "q99_skew_report",
    """
    WITH per_key AS (
      SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n_rows
      FROM lineitem GROUP BY l_suppkey
    ),
    totals AS (
      SELECT CAST(sum(n_rows) AS BIGINT) AS total,
             CAST(count(*) AS BIGINT) AS n_keys
      FROM per_key
    )
    SELECT l_suppkey, n_rows,
           round(n_rows / total, 6) AS share,
           round(n_rows / (total / n_keys), 2) AS skew_factor,
           n_rows / total > 1.0 / 32 AS hot
    FROM per_key CROSS JOIN totals
    ORDER BY n_rows DESC, l_suppkey
    LIMIT 20
    """,
)
def q99_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key diagnosis on lineitem's supplier key (operators/diagnostics):
    the decide-before-salting report, hash-oracled. The threshold pins the
    session's 32 shuffle partitions so both engines compute the same flag."""
    from crowdsorsa_etl_spark.operators.diagnostics import key_skew_report

    li = _t(spark, sf_dir, "lineitem")
    return key_skew_report(
        li, ["l_suppkey"], top_n=20, reducer_share_threshold=1.0 / 32
    )
