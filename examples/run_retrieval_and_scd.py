#!/usr/bin/env python
"""The round-7 tier in one flow — retrieval, compression, geo, and CDC the
way a training-data + warehouse deployment composes them:

    documents → BM25 postings → top-10 docs for ad-hoc queries
              → overlapping 64/48 training chunks (narrow plan)
    embeddings → PQ codebooks (32× compression) → ADC candidates
               → exact re-ranked top-k, recall vs brute force printed
    observation polygons → grid-cell spatial join of probe points
    events → SCD2 version history (q97) → temporal as-of lookup (q98)
           → a second day's batch folds in INCREMENTALLY (scd2_apply_batch)

Usage: python examples/run_retrieval_and_scd.py [sf_dir] [work_dir]
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from crowdsorsa_etl_spark.queries import QUERIES
from crowdsorsa_etl_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/crowdsorsa_round7_demo"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    spark = get_spark(app_name="round7-demo")

    print("== BM25 lexical retrieval ==")
    for r in QUERIES["llm_bm25_topk"](spark, sf_dir).filter(
        F.col("rank") <= 3
    ).orderBy("query_id", "rank").collect():
        print(f"  q{r.query_id} #{r.rank}: doc {r.doc_id}  bm25={r.bm25}")

    print("== training chunks (64 tokens, stride 48) ==")
    chunks = QUERIES["llm_doc_chunking"](spark, sf_dir)
    chunks.groupBy().agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.round(F.avg("n_tokens"), 1).alias("avg_tokens"),
    ).show()

    print("== PQ/ADC ANN vs exact brute force ==")
    from crowdsorsa_etl_spark.operators.pq import pq_topk
    from crowdsorsa_etl_spark.operators.similarity import cosine_topk
    from crowdsorsa_etl_spark.sources.parquet import load_table

    emb = load_table(spark, "embeddings", sf_dir)
    q = emb.filter(F.col("vec_id") < 10)
    exact = {(r.query_id, r.neighbor_id) for r in cosine_topk(emb, q, k=5).collect()}
    approx = {
        (r.query_id, r.neighbor_id)
        for r in pq_topk(emb, q, k=5, m=8, k_codes=64, candidate_margin=32).collect()
    }
    print(f"  recall@5 = {len(exact & approx) / len(exact):.2f} "
          f"(corpus scored through 8 codes/vector instead of 64 floats)")

    print("== grid spatial join (probe points vs season polygons) ==")
    print(f"  containments: {QUERIES['geo_spatial_join'](spark, sf_dir).count()}")

    print("== SCD2 version history + as-of lookup ==")
    versions = QUERIES["q97_scd2_versions"](spark, sf_dir)
    versions.groupBy("is_current").count().show()
    QUERIES["q98_scd2_asof_lookup"](spark, sf_dir).groupBy(
        "status_at_purchase"
    ).count().orderBy(F.col("count").desc()).show()

    print("== incremental SCD2: day-2 batch folds in ==")
    from crowdsorsa_etl_spark.operators.scd import scd2_apply_batch

    events = load_table(spark, "events", sf_dir)
    cut = events.agg(F.expr("percentile(CAST(ts AS DOUBLE), 0.8)")).first()[0]
    day1 = events.filter(F.col("ts").cast("double") <= cut)
    day2 = events.filter(F.col("ts").cast("double") > cut)
    scd_dir = os.path.join(work, "scd2")
    kw = dict(key_cols=["user_id"], ts_col="ts",
              tracked_cols=["event_type"], tie_break_cols=["event_id"])
    v1 = scd2_apply_batch(spark, scd_dir, day1, **kw)
    n1 = v1.count()
    v2 = scd2_apply_batch(spark, scd_dir, day2, **kw)
    print(f"  day 1: {n1} versions → after day 2: {v2.count()} versions "
          f"(runs continuing across the boundary opened no version)")

    spark.stop()
    print(f"\nall round-7 stages ran; work dir: {work}")


if __name__ == "__main__":
    main()
