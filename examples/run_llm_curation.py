#!/usr/bin/env python
"""End-to-end LLM training-data curation over the documents fixture — the
pipeline the LLM-extension operators exist for:

    corpus → exact dedup (md5 keep-first)
           → MinHash-LSH near-dup candidates → connected components
             → one keeper per near-dup cluster
           → language ID + quality scoring → filter
           → token stats on the surviving corpus
           → partitioned parquet of the curated set

Every stage is a registered operator; this wires them into one declarative
flow and prints the funnel. At 100 TB the same code runs with the inputs
pointed at the real corpus — no stage collects rows to the driver.

Usage: python examples/run_llm_curation.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from crowdsorsa_etl_spark.functions.text import (
    detect_language,
    quality_score,
    token_count,
)
from crowdsorsa_etl_spark.operators.clusters import dedup_clusters
from crowdsorsa_etl_spark.operators.dedup import (
    exact_dedup_keep_first,
    minhash_lsh_candidates,
)
from crowdsorsa_etl_spark.session import get_spark
from crowdsorsa_etl_spark.sinks.writers import write_partitioned
from crowdsorsa_etl_spark.sources.parquet import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="curated_")
    spark = get_spark(app_name="llm-curation")

    docs = load_table(spark, "documents", sf_dir)
    n0 = docs.count()

    # 1. exact dedup (hash-first, one fixed-width-key shuffle)
    exact = exact_dedup_keep_first(docs)
    n1 = exact.count()

    # 2. near-dedup: LSH candidates → clusters → keep one doc per cluster
    pairs = minhash_lsh_candidates(exact)
    clusters = dedup_clusters(exact, pairs)
    near = exact.join(
        clusters.filter(F.col("keep")).select("doc_id"), "doc_id", "left_semi"
    )
    n2 = near.count()

    # 3. language + quality gates (pure column expressions)
    scored = near.select(
        "*",
        detect_language(F.col("text")).alias("lang_detected"),
        quality_score(F.col("text")).alias("quality"),
        token_count(F.col("text")).alias("n_tokens"),
    )
    curated = scored.filter((F.col("quality") >= 0.3) & (F.col("n_tokens") >= 10))
    n3 = curated.count()

    # 4. corpus stats + partitioned write of the curated set
    stats = curated.groupBy("lang_detected").agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("n_tokens").alias("tokens"),
    )
    write_partitioned(
        curated.select("doc_id", "text", "lang_detected", "quality", "n_tokens"),
        os.path.join(out, "curated_parquet"),
        partition_by=["lang_detected"],
    )

    print(f"corpus funnel: {n0} raw -> {n1} exact-deduped -> "
          f"{n2} near-deduped -> {n3} quality-filtered")
    for r in stats.orderBy("lang_detected").collect():
        print(f"  lang={r.lang_detected}: {r.docs} docs, {r.tokens} tokens")
    print(f"curated corpus written to {out}/curated_parquet")
    spark.stop()


if __name__ == "__main__":
    main()
