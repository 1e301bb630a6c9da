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
from crowdsorsa_etl_spark import parity_oracles as _po
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


# ===========================================================================
# llm_bm25_querytable / llm_bm25_incremental — the round-7 verdict's BM25
# gaps closed: queries as a DataFrame (here DERIVED from the corpus inside
# the plan — the decontamination-sweep shape: "for each eval doc, find the
# training docs it retrieves"), and the postings index as an append-only
# materialized view whose post-append results are proven IDENTICAL to a
# full rebuild by the cross-engine oracle (the same merged≡rebuilt gate as
# q67/q91). See operators/bm25.py for the MV algebra and scale shape.
# ===========================================================================

from crowdsorsa_etl_spark.queries._shared import _NORM_SQL
from crowdsorsa_etl_spark.queries.round7_pack import (
    _BM25_CONTRIB_SQL,
    _BM25_ORACLE_SQL,
    _BM25_QUERIES,
)

_BM25_QT_SQL = f"""
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
    qt AS (
      SELECT CAST(doc_id AS INT) AS query_id,
             string_split({_NORM_SQL}, ' ') AS qtoks
      FROM documents WHERE doc_id < 3
    ),
    q AS (SELECT query_id, unnest(qtoks[1:4]) AS t FROM qt),
    dft AS (
      SELECT t, CAST(count(*) AS BIGINT) AS df
      FROM postings
      WHERE t IN (SELECT DISTINCT t FROM q)
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
    SELECT query_id, doc_id, bm25, rank
    FROM (SELECT *, CAST(row_number() OVER (
               PARTITION BY query_id ORDER BY bm25 DESC, doc_id ASC) AS INT)
               AS rank
          FROM scores)
    WHERE rank <= 10
"""


@register("llm_bm25_querytable", _BM25_QT_SQL)
def llm_bm25_querytable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 with a query TABLE built inside the plan: each of the first
    three documents' leading 4 tokens becomes a query — no literals
    anywhere, the full decontamination-sweep shape. Hash-oracled."""
    from crowdsorsa_etl_spark.functions.text import normalize_text
    from crowdsorsa_etl_spark.operators.bm25 import bm25_topk

    docs = _t(spark, sf_dir, "documents")
    queries = docs.filter(F.col("doc_id") < 3).select(
        F.col("doc_id").cast("int").alias("query_id"),
        F.array_join(
            F.slice(F.split(normalize_text(F.col("text")), " "), 1, 4), " "
        ).alias("text"),
    )
    return bm25_topk(docs, queries, k=10)


@register("llm_bm25_incremental", _BM25_ORACLE_SQL)
def llm_bm25_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 through the index AT REST after incremental maintenance: build
    postings from 90% of the corpus, APPEND the remaining 10% (pure file
    append — distributive MV, existing rows untouched), then score. The
    oracle is the FULL-corpus BM25 (identical to llm_bm25_topk's), so the
    hash match proves merged ≡ rebuilt across engines."""
    import shutil
    import tempfile

    from crowdsorsa_etl_spark.operators.bm25 import (
        bm25_append_index,
        bm25_query_index,
        bm25_write_index,
    )

    docs = _t(spark, sf_dir, "documents")
    path = tempfile.mkdtemp(prefix="bm25idx_")
    try:
        bm25_write_index(docs.filter(F.col("doc_id") % 10 != 0), path)
        bm25_append_index(docs.filter(F.col("doc_id") % 10 == 0), path)
        qdf = spark.createDataFrame(_BM25_QUERIES, "query_id int, text string")
        return bm25_query_index(spark, path, qdf, k=10).localCheckpoint()
    finally:
        shutil.rmtree(path, ignore_errors=True)


# ===========================================================================
# geo_polygon_join — polygon-polygon grid spatial join (round-7 verdict gap
# #4): fixture polygons vs their half-extent-shifted copies through
# operators/spatial.grid_polygon_join. The oracle is the ALL-PAIRS ground
# truth (segment-pair orientation tests + mutual vertex containment
# replayed in SQL), so the hash gate proves the grid prefilter, the
# reference-cell-ownership dedup, and the exact verify together.
# ===========================================================================


@register("geo_polygon_join", _po.polygon_join_sql())
def geo_polygon_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intersecting (original, shifted) polygon pairs via the grid join."""
    from crowdsorsa_etl_spark import parity_oracles
    from crowdsorsa_etl_spark.functions.geo import st_envelope, st_translate
    from crowdsorsa_etl_spark.operators.spatial import grid_polygon_join
    from crowdsorsa_etl_spark.schemas import OBSERVATIONS_2024

    d = parity_oracles.ensure_observation_fixtures()
    polys = (
        spark.read.schema(OBSERVATIONS_2024)
        .parquet(f"{d}/observations_2024.parquet")
        .select(F.col("tunniste").alias("a_id"), F.col("geometry_wkb").alias("a_wkb"))
    )
    env = polys.select(
        "a_id", "a_wkb", st_envelope(F.col("a_wkb")).alias("e")
    )
    shifted = env.select(
        F.col("a_id").alias("b_id"),
        st_translate(
            F.col("a_wkb"),
            (F.col("e.xmax") - F.col("e.xmin")) / 2.0,
            (F.col("e.ymax") - F.col("e.ymin")) / 2.0,
        ).alias("b_wkb"),
    )
    return grid_polygon_join(polys, shifted, cell_size=1000.0)


# ===========================================================================
# q100_scd2_buffered — the bounded-disorder SCD2 path (operators/scd
# scd2_apply_batch_buffered) proven cross-engine: the events log is split
# into two arrival batches with a deterministic subset of mid-timeline
# events DELAYED into the second batch (disorder within the watermark
# bound), applied through the buffer, and flushed. The oracle is q97's
# fully-ordered full rebuild — a hash match proves buffered == ordered.
# ===========================================================================


def _q97_oracle() -> str:
    from crowdsorsa_etl_spark.queries._shared import ORACLES

    return ORACLES["q97_scd2_versions"]


@register("q100_scd2_buffered", _q97_oracle())
def q100_scd2_buffered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 via the watermark buffer under bounded disorder ≡ q97's
    ordered rebuild (shared oracle)."""
    import shutil
    import tempfile

    from crowdsorsa_etl_spark.operators.scd import (
        scd2_apply_batch_buffered,
        scd2_flush_buffer,
    )

    ev = _t(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type", "event_id"
    )
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).collect()[0]
    span_s = (hi - lo).total_seconds()
    delay_s = max(span_s / 4.0, 1.0)
    mid = F.lit(lo) + F.expr(f"INTERVAL {span_s / 2.0} SECONDS")
    # deterministically delay ~20% of the events just before the midpoint
    # into batch 2 — late, but within delay_s of batch 1's max
    held_back = (
        (F.col("event_id") % 5 == 0)
        & (F.col("ts") > mid - F.expr(f"INTERVAL {delay_s / 2.0} SECONDS"))
        & (F.col("ts") <= mid)
    )
    b1 = ev.filter((F.col("ts") <= mid) & ~held_back)
    b2 = ev.filter((F.col("ts") > mid) | held_back)

    kw = dict(
        key_cols=["user_id"], ts_col="ts", tracked_cols=["event_type"],
        tie_break_cols=["event_id"],
    )
    root = tempfile.mkdtemp(prefix="scd2buf_")
    vd, bd = f"{root}/v", f"{root}/b"
    try:
        scd2_apply_batch_buffered(
            spark, vd, bd, b1, max_delay_seconds=delay_s, **kw
        )
        scd2_apply_batch_buffered(
            spark, vd, bd, b2, max_delay_seconds=delay_s, **kw
        )
        scd2_flush_buffer(spark, vd, bd, **kw)
        return (
            spark.read.parquet(vd)
            .select(
                "user_id", "event_type", "valid_from", "valid_to",
                "version", "is_current",
            )
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
