#!/usr/bin/env python
"""The round-15 tier in one flow — the pre-training data-layout mile as a
deployment wires it:

    documents → temperature mixing plan (alpha=0.5 shares from corpus stats)
              → exact-k per-stratum reservoir draw (eval holdout)
              → seeded global shuffle → contiguous 64-doc shards
                (order-exact manifest chains)
              → shuffle-quality audit (per-shard Gini-Simpson diversity)
    shard store → batch 0 init at rest
                → live tail-append of a later crawl batch (O(batch))
                → manifest re-verified after growth
    documents → T5 span corruption (input/target sentinel pairs)
              → FIM PSM reordering (infilling transform)
              → byte-BPE decode roundtrip on a corrupted sample

Usage: python examples/run_round15_tier.py [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from crowdsorsa_etl_spark.operators.denoising import fim_transform, span_corrupt
from crowdsorsa_etl_spark.operators.sharding import (
    shard_manifest,
    shard_store_append,
    shard_store_init,
)
from crowdsorsa_etl_spark.queries import QUERIES
from crowdsorsa_etl_spark.session import get_spark
from crowdsorsa_etl_spark.sources.parquet import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark()
    docs = load_table(spark, "documents", sf_dir)

    print("== Temperature mixing plan (alpha = 0.5) ==")
    QUERIES["llm_source_temperature_mix"](spark, sf_dir).orderBy("source").show(
        truncate=False
    )

    print("== Exact-k reservoir draw per (lang, source) ==")
    rsv = QUERIES["llm_reservoir_sample_k"](spark, sf_dir)
    rsv.orderBy("lang", "source", "sample_rank").show(9)
    print(f"holdout rows: {rsv.count()}")

    print("== Seeded global shuffle → shards (order-exact manifest) ==")
    QUERIES["llm_train_shuffle_shards"](spark, sf_dir).orderBy(
        "shard_id"
    ).show(6, truncate=False)

    print("== Shuffle quality: per-shard source diversity ==")
    QUERIES["llm_shuffle_quality"](spark, sf_dir).orderBy("shard_id").show(6)

    print("== Shard store: init batch 0, tail-append batch 1 ==")
    root = tempfile.mkdtemp(prefix="round15_store_")
    try:
        b0 = docs.filter(F.col("doc_id") % 3 != 0).select("doc_id")
        b1 = docs.filter(F.col("doc_id") % 3 == 0).select("doc_id")
        shard_store_init(b0, root, shard_docs=64)
        print(f"after init:   {shard_manifest(spark, root).count()} shards")
        shard_store_append(b1, root, shard_docs=64)
        m = shard_manifest(spark, root)
        print(f"after append: {m.count()} shards")
        m.orderBy("shard_id").show(4, truncate=False)
    finally:
        shutil.rmtree(root, ignore_errors=True)

    print("== T5 span corruption (input, target) pairs ==")
    span_corrupt(docs).select(
        "doc_id", "n_spans", "input_text", "target_text"
    ).show(3, truncate=80)

    print("== FIM PSM reordering ==")
    fim_transform(docs).show(3, truncate=80)

    print("== Byte-BPE decode roundtrip on corrupted text ==")
    from crowdsorsa_etl_spark.operators.bytebpe import (
        _byte_seed,
        _encode_word_seq,
        bytebpe_decode,
        bytebpe_learn,
    )

    merges = [
        tuple(r["pair"].split(" "))
        for r in bytebpe_learn(docs.limit(50), n_merges=8).collect()
    ]
    rank_of = {tuple(p): i for i, p in enumerate(merges)}
    pair_at = list(map(tuple, merges))
    word = "<extra_id_0>"
    syms = _encode_word_seq(_byte_seed(word), rank_of, pair_at)
    assert bytebpe_decode(syms) == word.encode("utf-8")
    print(f"decode(encode({word!r})) roundtrips through {len(syms)} tokens")

    spark.stop()


if __name__ == "__main__":
    main()
