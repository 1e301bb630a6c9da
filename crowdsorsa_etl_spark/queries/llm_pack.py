"""LLM-data-pipeline pack + LSH tier (exact dedup ... winnow, ANN entries).

Split from the original monolithic queries.py in round 5. Registration
ORDER is load-bearing (the driver's correctness window samples the first 50
registrations), so modules are imported in the original file order by
queries/__init__.py, which also asserts the canonical order afterwards.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from crowdsorsa_etl_spark import lsh_oracles  # noqa: F401
from crowdsorsa_etl_spark.functions.text import (  # noqa: F401
    _LANG_MARKERS,
    detect_language,
    quality_features,
    quality_score,
    token_count,
)
from crowdsorsa_etl_spark.operators.dedup import (  # noqa: F401
    exact_dedup,
    simhash_buckets,
    token_jaccard_pairs,
)
from crowdsorsa_etl_spark.operators.similarity import cosine_topk, lsh_topk  # noqa: F401
from crowdsorsa_etl_spark.pipelines.flagship import order_documents  # noqa: F401
from crowdsorsa_etl_spark.queries._shared import (
    _NORM_SQL,
    _t,
    register,
)

# ===========================================================================
# LLM-data-pipeline operators (SURVEY §2.2 extension pack)
# ===========================================================================



@register(
    "llm_exact_dedup",
    f"""
    SELECT md5({_NORM_SQL}) AS text_md5,
           min(doc_id) AS keep_id,
           count(*) AS n_copies
    FROM documents
    GROUP BY 1
    """,
)
def llm_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_dedup(_t(spark, sf_dir, "documents"))


@register(
    "llm_token_jaccard",
    f"""
    WITH toks AS (
      SELECT doc_id AS id, lang AS blk,
             unnest(list_distinct(string_split({_NORM_SQL}, ' '))) AS tok
      FROM documents
    ),
    sizes AS (SELECT id, count(*) AS n FROM toks GROUP BY id),
    inter AS (
      SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_common
      FROM toks a JOIN toks b
        ON a.blk = b.blk AND a.tok = b.tok AND a.id < b.id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           round(n_common / (sa.n + sb.n - n_common), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON id_a = sa.id
    JOIN sizes sb ON id_b = sb.id
    WHERE round(n_common / (sa.n + sb.n - n_common), 6) >= 0.8
    """,
)
def llm_token_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact near-dup ground truth (token-set Jaccard, lang-blocked)."""
    return token_jaccard_pairs(
        _t(spark, sf_dir, "documents"), threshold=0.8
    )


@register(
    "llm_text_stats",
    """
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN len(regexp_replace(text, '^\\s+|\\s+$', '', 'g')) = 0 THEN 0
                    ELSE len(regexp_split_to_array(regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+')) END) AS BIGINT)
             AS total_tokens,
           round(avg(n_chars), 2) AS avg_chars,
           CAST(count(DISTINCT source) AS BIGINT) AS n_sources
    FROM documents
    GROUP BY lang
    """,
)
def llm_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count(F.col("text"))).cast("bigint").alias("total_tokens"),
        F.round(F.avg("n_chars"), 2).alias("avg_chars"),
        F.countDistinct("source").alias("n_sources"),
    )


#: the quality_score scalar as a DuckDB expression over a `text` column —
#: shared by llm_quality's oracle and the curriculum tier (one fragment so
#: the score definition cannot drift between consumers)
QUALITY_SQL_EXPR = """round((
             CASE WHEN (CASE WHEN len(regexp_replace(text, '^\\s+|\\s+$', '', 'g')) = 0 THEN 0
                        ELSE len(regexp_split_to_array(regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+')) END)
                       BETWEEN 5 AND 100000 THEN 1.0 ELSE 0.0 END
             + CASE WHEN len(regexp_replace(text, '[^A-Za-zÀ-öø-ÿ]', '', 'g'))
                         / CASE WHEN len(text) = 0 THEN 1 ELSE len(text) END >= 0.6
                    THEN 1.0
                    ELSE (len(regexp_replace(text, '[^A-Za-zÀ-öø-ÿ]', '', 'g'))
                          / CASE WHEN len(text) = 0 THEN 1 ELSE len(text) END) / 0.6 END
             + CASE WHEN len(regexp_replace(text, '[^0-9]', '', 'g'))
                         / CASE WHEN len(text) = 0 THEN 1 ELSE len(text) END <= 0.2
                    THEN 1.0 ELSE 0.0 END
           ) / 3.0, 6)"""


@register(
    "llm_quality",
    f"""
    SELECT doc_id,
           CAST(CASE WHEN len(regexp_replace(text, '^\\s+|\\s+$', '', 'g')) = 0 THEN 0
                ELSE len(regexp_split_to_array(regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+')) END AS BIGINT)
             AS n_tokens,
           round(len(regexp_replace(text, '[^A-Za-zÀ-öø-ÿ]', '', 'g'))
                 / CASE WHEN len(text) = 0 THEN 1 ELSE len(text) END, 6) AS alpha_ratio,
           round(len(regexp_replace(text, '[^0-9]', '', 'g'))
                 / CASE WHEN len(text) = 0 THEN 1 ELSE len(text) END, 6) AS digit_ratio,
           {QUALITY_SQL_EXPR} AS quality
    FROM documents
    """,
)
def llm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    feats = quality_features(F.col("text"))
    return docs.select(
        "doc_id",
        feats["n_tokens"].alias("n_tokens"),
        F.round(feats["alpha_ratio"], 6).alias("alpha_ratio"),
        F.round(feats["digit_ratio"], 6).alias("digit_ratio"),
        quality_score(F.col("text")).alias("quality"),
    )


def _lang_detect_sql() -> str:
    """Generate the DuckDB oracle for detect_language from the same marker
    table the Spark expression uses — parity by construction."""
    score_exprs = {}
    for lang, markers in _LANG_MARKERS.items():
        parts = [
            f"(len(string_split(' ' || lower(text) || ' ', '{m}')) - 1)"
            for m in markers
        ]
        score_exprs[lang] = " + ".join(parts)
    greatest = "greatest(" + ", ".join(f"s_{lang}" for lang in _LANG_MARKERS) + ")"
    cases = " ".join(
        f"WHEN s_{lang} > 0 AND s_{lang} = {greatest} THEN '{lang}'"
        for lang in _LANG_MARKERS
    )
    scores = ", ".join(f"{expr} AS s_{lang}" for lang, expr in score_exprs.items())
    return f"""
    SELECT doc_id, CASE {cases} ELSE 'und' END AS lang_pred
    FROM (SELECT doc_id, {scores} FROM documents)
    """


@register("llm_lang_detect", _lang_detect_sql())
def llm_lang_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", detect_language(F.col("text")).alias("lang_pred"))


@register(
    "llm_fingerprint",
    f"""
    SELECT doc_id,
           md5({_NORM_SQL}) AS fp_md5,
           CAST(len(text) AS INT) AS n_chars_raw
    FROM documents
    """,
)
def llm_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    from crowdsorsa_etl_spark.functions.text import normalize_text

    norm = normalize_text(F.col("text"))
    return docs.select(
        "doc_id",
        F.md5(norm).alias("fp_md5"),
        F.length("text").alias("n_chars_raw"),
    )


# shared with llm_cosine_topk_vectorized (same query shape; since round 7 the
# BLAS path re-scores its candidates with the expression path, so both are
# bit-identical to this oracle)
COSINE_TOPK_ORACLE_SQL = """
    WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
               FROM embeddings WHERE vec_id < 10),
    c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
          FROM embeddings),
    s AS (SELECT query_id, neighbor_id,
                 round(list_dot_product(qv, cv)
                       / (sqrt(list_dot_product(qv, qv))
                          * sqrt(list_dot_product(cv, cv))), 6) AS cosine
          FROM q JOIN c ON neighbor_id != query_id)
    SELECT query_id, neighbor_id, cosine, rank
    FROM (SELECT *, CAST(row_number() OVER (
                 PARTITION BY query_id
                 ORDER BY cosine DESC, neighbor_id ASC) AS INT) AS rank
          FROM s)
    WHERE rank <= 5
    """


@register("llm_cosine_topk", COSINE_TOPK_ORACLE_SQL)
def llm_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force exact cosine top-k (the ANN baseline + oracle truth)."""
    emb = _t(spark, sf_dir, "embeddings")
    return cosine_topk(emb, emb.filter(F.col("vec_id") < 10), k=5)


@register(
    "llm_multimodal_bytes",
    """
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS INT) AS n_bytes,
           CAST(len(text) AS INT) AS n_chars
    FROM documents
    """,
)
def llm_multimodal_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column plumbing: text → UTF-8 bytes in a BinaryType column
    (the decode/feature-extract path continues in operators/multimodal.py)."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.length(F.encode(F.col("text"), "UTF-8")).alias("n_bytes"),
        F.length("text").alias("n_chars"),
    )


# ===========================================================================
# Flagship full-JSON oracle: DuckDB assembles the IDENTICAL document string
# that Spark's to_json(struct, ignoreNullFields=true) emits — struct fields in
# declaration order, no whitespace, the nullable "notes" key conditionally
# omitted, units sorted by the full struct (sort_array field-by-field
# ordering), empty-units orders rendering "units":[].
#
# Byte-exactness rests on three conventions:
# * netPrice is the exact DECIMAL(12,2) product cast to double (no round()
#   step — pipelines/flagship.py), so both engines hold the same double and
#   both print its shortest round-trip decimal form;
# * doubles at these magnitudes (quantity 1-50, netPrice < 1.1e5) stay in
#   both engines' non-scientific print range, and the shortest form is the
#   2-to-4-decimal literal itself (double spacing at 1e5 is ~1.5e-11, so the
#   literal uniquely identifies the double in both Jackson and DuckDB);
# * string values pass through to_json() on the DuckDB side, which applies
#   the same JSON escaping rules Jackson does for this ASCII fixture corpus
#   (neither engine escapes '/').
# ===========================================================================

_FLAGSHIP_NET_SQL = (
    "CAST(CAST(l_extendedprice AS DECIMAL(12,2))"
    " * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))"
    " AS DOUBLE)"
)

_FLAGSHIP_DOC_SQL = f"""
    WITH units AS (
      SELECT l_orderkey,
             '[' || string_agg(
               '{{"lineNumber":' || l_linenumber
               || ',"partKey":' || l_partkey
               || ',"quantity":' || CAST(l_quantity AS VARCHAR)
               || ',"netPrice":' || CAST({_FLAGSHIP_NET_SQL} AS VARCHAR)
               || ',"returnFlag":' || to_json(l_returnflag) || '}}',
               ','
               ORDER BY l_linenumber, l_partkey, l_quantity,
                        {_FLAGSHIP_NET_SQL}, l_returnflag
             ) || ']' AS units_json
      FROM lineitem GROUP BY 1
    ),
    docs AS (
      SELECT o.o_orderkey, o.o_totalprice, o.o_orderpriority,
             c.c_name, c.c_mktsegment, n.n_name, u.units_json,
             'http://example.invalid/orders/' || o.o_orderkey AS docid,
             strftime(o.o_orderdate, '%Y-%m-%d') AS d
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      LEFT JOIN units u ON o.o_orderkey = u.l_orderkey
    )
    SELECT o_orderkey AS order_key,
           o_totalprice AS total_price,
           '{{"schema":"order-etl","documentId":' || to_json(docid)
           || ',"publicDocument":{{"concealment":"PUBLIC","keywords":['
           || to_json(CAST(o_orderkey AS VARCHAR)) || ','
           || to_json('segment-' || c_mktsegment) || ']'
           || CASE WHEN o_orderpriority = '1-URGENT'
                   THEN ',"notes":' || to_json('Urgent order for ' || c_name)
                   ELSE '' END
           || ',"gatherings":[{{"gatheringId":' || to_json(docid || '_G')
           || ',"eventDate":{{"begin":"' || d || '","end":"' || d || '"}}'
           || ',"municipality":' || to_json(n_name)
           || ',"units":' || coalesce(units_json, '[]')
           || '}}]}}}}' AS document_json
    FROM docs
"""


@register("flagship_order_documents", _FLAGSHIP_DOC_SQL)
def flagship_order_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The entry() query (reference signature op, crowdsorsa-etl-2023.R:120-179
    at TPC-H scale) under a FULL byte-exact JSON oracle since round 7 — the
    nested document string itself is hash-compared, not just extracted
    fields (flagship_doc_fields) or the units layer (flagship_units_agg)."""
    return order_documents(spark, sf_dir)


# ===========================================================================
# Rows-only entries (non-SQL-expressible: sketch internals, binary decode) —
# driver records a weaker rows-only check.
# ===========================================================================


@register(
    "flagship_doc_fields",
    """
    WITH units AS (SELECT l_orderkey, count(*) AS n FROM lineitem GROUP BY 1)
    SELECT o.o_orderkey AS order_key,
           n.n_name AS municipality,
           strftime(o.o_orderdate, '%Y-%m-%d') AS begin_date,
           CASE WHEN o.o_orderpriority = '1-URGENT'
                THEN 'Urgent order for ' || c.c_name END AS notes,
           CAST(coalesce(u.n, 0) AS BIGINT) AS n_units
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    LEFT JOIN units u ON o.o_orderkey = u.l_orderkey
    """,
)
def flagship_doc_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Field-level oracle for the flagship nested documents: parse the
    emitted JSON BACK OUT with JSON-path expressions and hash-compare the
    extracted business fields against an oracle that recomputes them from
    the raw tables — a round-trip gate on the document assembly (the full
    nested JSON itself stays rows-only: key ordering/whitespace are
    serializer-specific)."""
    docs = order_documents(spark, sf_dir)
    jp = lambda p: F.get_json_object("document_json", p)  # noqa: E731
    return docs.select(
        "order_key",
        jp("$.publicDocument.gatherings[0].municipality").alias("municipality"),
        jp("$.publicDocument.gatherings[0].eventDate.begin").alias("begin_date"),
        jp("$.publicDocument.notes").alias("notes"),
        F.expr(
            "json_array_length(get_json_object(document_json,"
            " '$.publicDocument.gatherings[0].units'))"
        ).cast("bigint").alias("n_units"),
    )


@register("llm_minhash_lsh", lsh_oracles.minhash_lsh_sql())
def llm_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded MinHash-LSH candidate pairs, portable-hash variant: every
    signature word derives from md5 (functions/portable_hash), so the DuckDB
    oracle re-derives the identical signatures and the driver hash-compares
    the pairs — a full end-to-end correctness gate, not rows-only. The
    xxhash64 default stays available for perf-sensitive library use."""
    from crowdsorsa_etl_spark.queries._shared import _lsh_pairs

    return _lsh_pairs(spark, sf_dir)


@register("llm_simhash", lsh_oracles.simhash_buckets_sql())
def llm_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-collision SimHash buckets over md5-derived 64-bit signatures
    (portable=True → the oracle replays the same 64 bit-votes in SQL)."""
    from crowdsorsa_etl_spark.queries._shared import _simhash_sigs

    return simhash_buckets(
        _t(spark, sf_dir, "documents"),
        portable=True,
        signatures=_simhash_sigs(spark, sf_dir),
    )


@register("llm_simhash_hamming", lsh_oracles.simhash_hamming_sql(radius=4))
def llm_simhash_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hamming ≤ 4 near-dup pairs via pigeonhole bit-band LSH. Portable
    md5-derived signatures since round 5: the DuckDB oracle re-derives
    signatures, bands, candidate pairs, and bit_count verification, closing
    the rows-only gap; the brute-force-equality gate in
    tests/test_operators.py still covers the xxhash64 default.

    radius=4 → 5 bands × 12 bits: 4096 buckets per band keeps bucket
    occupancy low even on this dup-heavy corpus (radius 8 would mean 7-bit
    bands — 128 buckets — whose hot buckets blow up the candidate join)."""
    from crowdsorsa_etl_spark.operators.dedup import simhash_hamming_candidates
    from crowdsorsa_etl_spark.queries._shared import _simhash_sigs

    return simhash_hamming_candidates(
        _t(spark, sf_dir, "documents"),
        radius=4,
        portable=True,
        signatures=_simhash_sigs(spark, sf_dir),
    )


@register("llm_multimodal_embed_topk", lsh_oracles.multimodal_embed_topk_sql())
def llm_multimodal_embed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full multimodal similarity pipeline: binary payload → deterministic
    feature extraction (mapInPandas) → exact cosine top-k — the composition
    the engine is built for. Oracle since round 6: the stand-in encoder is
    pure integer/float arithmetic, so the DuckDB SQL replays payload → byte
    histogram → projection → float32 quantization → cosine re-rank end to
    end (lsh_oracles.multimodal_embed_topk_sql)."""
    from crowdsorsa_etl_spark.operators.multimodal import (
        attach_binary_payload,
        extract_features,
    )
    from crowdsorsa_etl_spark.operators.similarity import cosine_topk

    docs = _t(spark, sf_dir, "documents")
    emb = extract_features(attach_binary_payload(docs), dim=16).localCheckpoint()
    return cosine_topk(emb, emb.filter(F.col("vec_id") < 5), k=5)


@register("llm_winnow_overlap", lsh_oracles.winnow_overlap_sql(min_shared=2))
def llm_winnow_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (rolling-hash) fingerprint overlap pairs — MOSS-style copy
    detection. Portable md5 k-gram hashes since round 5, so the DuckDB
    oracle replays the k-gram → window-min → doc-freq-cap → join pipeline
    verbatim; the shared-substring guarantee stays unit-tested."""
    from crowdsorsa_etl_spark.operators.dedup import winnow_overlap_pairs

    return winnow_overlap_pairs(
        _t(spark, sf_dir, "documents"), min_shared=2, portable=True
    )


@register("llm_lsh_topk", lsh_oracles.lsh_topk_sql())
def llm_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SRP-LSH approximate top-k. Oracle since round 6: the hyperplanes are
    deterministic literals, so the DuckDB SQL re-derives the same buckets,
    candidate pairs, and sequential-cosine re-rank
    (lsh_oracles.lsh_topk_sql) — candidate-for-candidate hash parity."""
    emb = _t(spark, sf_dir, "embeddings")
    return lsh_topk(emb, emb.filter(F.col("vec_id") < 10), dim=64, k=5)


@register(
    "llm_embedding_dups",
    """
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                 round(list_dot_product(a.v, b.v)
                       / (sqrt(list_dot_product(a.v, a.v))
                          * sqrt(list_dot_product(b.v, b.v))), 6) AS cosine
          FROM e a JOIN e b ON a.vec_id < b.vec_id)
    SELECT id_a, id_b, cosine FROM p WHERE cosine >= 0.35
    """,
)
def llm_embedding_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact embedding-cosine near-dup pairs (the ground truth the LSH tier
    is recall-gated against; quadratic — verify-only at scale)."""
    from crowdsorsa_etl_spark.operators.similarity import embedding_cosine_pairs

    return embedding_cosine_pairs(_t(spark, sf_dir, "embeddings"), threshold=0.35)


@register("llm_embedding_dups_lsh", lsh_oracles.embedding_dups_lsh_sql())
def llm_embedding_dups_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SRP-LSH embedding near-dup pairs — the 100 TB path. Oracle since
    round 6: the DuckDB SQL replays bucket assignment from the same plane
    literals and verifies the deduped candidates with the sequential
    expression-path cosine (portable=True); recall vs the exact pairs stays
    gated in tests/test_operators.py, and the BLAS verifier remains the
    library default."""
    from crowdsorsa_etl_spark.operators.similarity import embedding_cosine_pairs_lsh

    return embedding_cosine_pairs_lsh(
        _t(spark, sf_dir, "embeddings"), dim=64, threshold=0.35, portable=True
    )


@register("llm_ivf_topk", lsh_oracles.ivf_topk_sql(n_lists=16, n_probe=8))
def llm_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN top-k. Oracle since round 6: the sample trainer is fully
    deterministic (first-N init, first-occurrence argmax, stable argsort
    probes — all integer decisions, robust to summation-order ulp), so the
    DuckDB SQL replays the 5 unrolled Lloyd iterations, list assignment,
    probe selection, and raw-vector re-rank end to end
    (lsh_oracles.ivf_topk_sql). Recall gate vs exact cosine_topk stays in
    tests/test_operators.py."""
    from crowdsorsa_etl_spark.operators.similarity import ivf_topk

    emb = _t(spark, sf_dir, "embeddings")
    return ivf_topk(
        emb, emb.filter(F.col("vec_id") < 10), k=5, n_lists=16, n_probe=8
    )


