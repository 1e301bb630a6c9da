#!/usr/bin/env python
"""The round-13 tier in one flow — the tokenizer-family and
entity-resolution operators wired the way a corpus-prep deployment runs
them:

    documents → WordPiece learn (likelihood-ratio merges, capped dict)
              → vocabulary (alphabet + merges) → greedy encode per word
              → token-id streams (training export)
    documents → MinHash-LSH candidates vs exact shingle-Jaccard truth
              → per-threshold precision/recall (tune bands on MEASURED
                numbers, not folklore)
    customer  → dirty twin → multipass-blocked Fellegi–Sunter pairs
              → connected components → golden-record table
    documents → power-of-2 length buckets → boundary-preserving packing
                assignment + padding-waste report

Usage: python examples/run_tokenizer_and_er.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from crowdsorsa_etl_spark.operators.wordpiece import (
    wordpiece_encode_words,
    wordpiece_learn,
    wordpiece_token_ids,
    wordpiece_vocab,
)
from crowdsorsa_etl_spark.queries import QUERIES
from crowdsorsa_etl_spark.session import get_spark
from crowdsorsa_etl_spark.sources.parquet import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="run_tokenizer_and_er")
    docs = load_table(spark, "documents", sf_dir)

    print("== WordPiece: learn -> vocab -> encode -> token ids ==")
    merges = wordpiece_learn(docs, n_merges=16, max_vocab_words=24)
    merges.show(8, truncate=False)
    vocab = wordpiece_vocab(docs, merges)
    print(f"vocabulary: {vocab.count()} tokens (alphabet x2 + merges)")
    enc = wordpiece_encode_words(docs, vocab)
    enc.orderBy(F.desc("cnt")).show(6, truncate=False)
    ids = wordpiece_token_ids(docs, merges)
    print(f"token-id streams: {ids.count()} docs")
    ids.show(3, truncate=False)

    print("== LSH audit: measured precision/recall per threshold ==")
    QUERIES["llm_lsh_audit"](spark, sf_dir).show(truncate=False)

    print("== Entity resolution: golden records ==")
    ent = QUERIES["llm_entity_resolution"](spark, sf_dir)
    ent.orderBy(F.desc("n_records"), "entity_id").show(6, truncate=False)
    print(f"entities: {ent.count()}")

    print("== Boundary-preserving packing: per-bin waste ==")
    QUERIES["llm_bucket_pack_assign"](spark, sf_dir).orderBy(
        "bucket_len", "bin_id"
    ).show(8)

    spark.stop()


if __name__ == "__main__":
    main()
