"""Round 10: production-vocabulary BPE encode (the mapInPandas merge loop
at 256 learned merges), real token-id output (vocab table → id arrays), and
the token-id training-shard export tier.

Registration ORDER is load-bearing (the driver's correctness window samples
the first 50 registrations); this module is imported LAST by
queries/__init__.py, so its entries append after the round-9 tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crowdsorsa_etl_spark.queries._shared import _t, register


# ===========================================================================
# llm_bpe_encode_256 — the APPLY side at a production-ish merge count: the
# Arrow-batched mapInPandas merge loop (sequential-once semantics, per-
# unique-word memoization) applies the driver-learned 256-merge table —
# the 32k-vocab shape, where a literal expression chain would blow codegen.
# The oracle re-learns AND re-applies all 256 stages in DuckDB with the
# same exhaustion guards the learn oracle carries (sf0.01's vocabulary
# exhausts before 256 merges, so the no-op-stage path runs for real on
# both engines). A parity test additionally pins the batch path to the
# expression path at 8 merges.
# ===========================================================================

from crowdsorsa_etl_spark.operators.bpe import bpe_encode_sql as _enc_sql


@register("llm_bpe_encode_256", _enc_sql(n_merges=256))
def llm_bpe_encode_256(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize every document through the batch merge loop with the
    256-merge driver-learned table (llm_bpe_merges_256's artifact)."""
    from crowdsorsa_etl_spark.operators.bpe import bpe_encode, bpe_learn_merges

    docs = _t(spark, sf_dir, "documents")
    merge_rows = bpe_learn_merges(
        docs, n_merges=256, strategy="driver"
    ).collect()
    merges = [tuple(r["pair"].split(" ")) for r in merge_rows]
    return bpe_encode(docs, merges, strategy="batch")


# ===========================================================================
# llm_bpe_token_ids — REAL token ids, the column a training run consumes:
# vocabulary = sorted distinct base chars (ids from 0) + merge symbols at
# n_base + rank - 1, derived from the SAME learned merge table on both
# engines; documents encode to id streams and the md5 of the comma-joined
# ids is the gate. A wrong learned merge, a wrong vocab id, or a wrong
# application each break the hash.
# ===========================================================================

from crowdsorsa_etl_spark.operators.bpe import (
    bpe_token_ids_sql as _ids_sql,
)

_IDS_MERGES = 8


@register("llm_bpe_token_ids", _ids_sql(n_merges=_IDS_MERGES))
def llm_bpe_token_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode every document to BPE token ids (learn merges → derive the
    vocab table → map the symbol stream to ids, JVM-side literal map)."""
    from crowdsorsa_etl_spark.operators.bpe import (
        bpe_encode_ids,
        bpe_learn_merges,
        bpe_vocab,
    )

    docs = _t(spark, sf_dir, "documents")
    merge_rows = bpe_learn_merges(docs, n_merges=_IDS_MERGES).collect()
    merges = [tuple(r["pair"].split(" ")) for r in merge_rows]
    vocab = {
        r["token"]: r["token_id"] for r in bpe_vocab(docs, merges).collect()
    }
    return bpe_encode_ids(docs, merges, vocab)


# ===========================================================================
# llm_token_id_shards — the training-data story's LAST step: documents
# encode to token ids and pack into ~budget-token shards via the
# distributed global prefix sum (q108's math over REAL BPE token counts,
# carrying the id-stream hash per doc) — a shard writer persists exactly
# these columns. Oracle: the full token-id chain wrapped in a window
# cumsum, single textbook `sum() OVER (ORDER BY doc_id)`.
# ===========================================================================

_SHARD_BUDGET_IDS = 10_000


def _token_id_shards_sql() -> str:
    return f"""
    WITH ids AS ({_ids_sql(n_merges=_IDS_MERGES)})
    SELECT doc_id, n_tokens, ids_md5,
           CAST(sum(n_tokens) OVER (ORDER BY doc_id) AS BIGINT) AS cum_tokens,
           CAST(floor((sum(n_tokens) OVER (ORDER BY doc_id) - n_tokens)
                      / {_SHARD_BUDGET_IDS}.0) AS INT) AS shard_id
    FROM ids
    """


@register("llm_token_id_shards", _token_id_shards_sql())
def llm_token_id_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget shard assignment over real BPE token counts: global
    cumsum via range sort + per-partition offsets (no single-partition
    window), shard id from the running total, id-stream hash per doc."""
    from crowdsorsa_etl_spark.operators.bpe import (
        bpe_encode_ids,
        bpe_learn_merges,
        bpe_vocab,
    )
    from crowdsorsa_etl_spark.operators.global_rank import with_global_cumsum

    docs = _t(spark, sf_dir, "documents")
    merge_rows = bpe_learn_merges(docs, n_merges=_IDS_MERGES).collect()
    merges = [tuple(r["pair"].split(" ")) for r in merge_rows]
    vocab = {
        r["token"]: r["token_id"] for r in bpe_vocab(docs, merges).collect()
    }
    ids = bpe_encode_ids(docs, merges, vocab)
    out = with_global_cumsum(
        ids, [F.col("doc_id")], "n_tokens", cum_col="cum_tokens"
    )
    return out.select(
        "doc_id",
        "n_tokens",
        "ids_md5",
        "cum_tokens",
        F.floor(
            (F.col("cum_tokens") - F.col("n_tokens"))
            / float(_SHARD_BUDGET_IDS)
        )
        .cast("int")
        .alias("shard_id"),
    )


# ===========================================================================
# llm_video_frames — the REAL video modality end to end: each doc renders
# into a genuine MJPEG-in-AVI container (functions/videocodec.py), and
# decode_video_frames walks the RIFF tree, samples every 2nd frame, and
# Huffman-decodes each sampled frame through the stdlib JPEG decoder — no
# fake fallback anywhere. JPEG is lossy, so the hash oracle gates what is
# exactly derivable cross-engine (container geometry: frame count from the
# closed-form text-length rule, sampled frame indices, fps, dimensions);
# pixel fidelity is gated by the codec unit tests (the
# llm_image_decode_jpeg posture).
# ===========================================================================


@register(
    "llm_video_frames",
    """
    WITH d AS (
      SELECT doc_id,
             (octet_length(encode(coalesce(text, ''))) % 3) + 1 AS nf
      FROM documents WHERE doc_id < 200
    )
    SELECT doc_id,
           'avi/mjpeg' AS format,
           CAST((i - 1) * 2 AS INT) AS frame_idx,
           CAST(nf AS INT) AS n_frames,
           CAST(10 AS INT) AS fps,
           CAST(8 AS INT) AS width,
           CAST(8 AS INT) AS height
    FROM d, UNNEST(range(1, ((nf + 1) // 2) + 1)) AS t(i)
    """,
)
def llm_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-and-decode real MJPEG/AVI frames; emit the exactly-replayable
    container-geometry columns."""
    from crowdsorsa_etl_spark.operators.multimodal import (
        attach_avi_payload,
        decode_video_frames,
    )

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    avi = attach_avi_payload(docs)
    return decode_video_frames(avi, every_n=2).select(
        "doc_id", "format", "frame_idx", "n_frames", "fps", "width", "height"
    )
