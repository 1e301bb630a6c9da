"""Fixed-window training-chunk materialization — THE chunk grid.

One implementation shared by the batch query (llm_doc_chunking) and the
streaming curation ingest (streaming.start_curation_stream), so the two
corpora can never silently diverge in schema or tail handling: documents
split once, chunk starts via sequence(), posexplode, slice — a fully
narrow whole-stage-codegen plan (no joins, no exchange).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crowdsorsa_etl_spark.functions.text import normalize_text


def chunk_documents(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 64,
    stride: int = 48,
) -> DataFrame:
    """(id, chunk_idx, start_token, n_tokens, chunk_text): overlapping
    ``size``-token windows every ``stride`` tokens, short tail kept, blank
    documents dropped. ``stride`` must be in (0, size] — a larger stride
    would silently drop tokens from the training corpus."""
    if not 0 < stride <= size:
        raise ValueError(
            f"stride must be in (0, size]; got stride={stride}, size={size} "
            "(stride > size silently loses tokens)"
        )
    base = df.filter(F.length(F.trim(F.col(text_col))) > 0).select(
        id_col, F.split(normalize_text(F.col(text_col)), " ").alias("_toks")
    )
    sized = base.withColumn("_n", F.size("_toks")).withColumn(
        "_starts", F.sequence(F.lit(0), F.col("_n") - 1, F.lit(stride))
    )
    return sized.select(
        id_col,
        F.posexplode("_starts").alias("chunk_idx", "start_token"),
        "_toks",
        "_n",
    ).select(
        id_col,
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.col("start_token").cast("int").alias("start_token"),
        F.least(F.lit(size), F.col("_n") - F.col("start_token"))
        .cast("int")
        .alias("n_tokens"),
        F.array_join(
            F.slice(F.col("_toks"), F.col("start_token") + 1, F.lit(size)), " "
        ).alias("chunk_text"),
    )
