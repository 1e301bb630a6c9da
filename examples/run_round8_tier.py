#!/usr/bin/env python
"""The round-8 tier in one flow — the production retrieval + streaming-scale
pieces composed the way a deployment uses them:

    embeddings → IVF-PQ index AT REST (codes partitioned by inverted list)
               → pruned-partition ADC search, flat vs RESIDUAL encoding,
                 recall vs brute force printed for both
    documents  → BM25 postings index → APPEND a new corpus slice (pure file
                 append) → query-table scoring ≡ full rebuild
               → hybrid retrieval: BM25 ⊕ dense cosine via RRF
    polygons   → polygon-polygon grid join (originals vs shifted copies)
    events     → SCD2 through the bounded-disorder watermark buffer: a late
                 mid-timeline slice still lands in order

Usage: python examples/run_round8_tier.py [sf_dir] [work_dir]
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from crowdsorsa_etl_spark.session import get_spark
from crowdsorsa_etl_spark.sources.parquet import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/crowdsorsa_round8_demo"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    spark = get_spark(app_name="round8-demo")

    # --- IVF-PQ index at rest: flat vs residual ---------------------------
    from crowdsorsa_etl_spark.operators.pq import (
        ivfpq_query_index,
        ivfpq_write_index,
    )
    from crowdsorsa_etl_spark.operators.similarity import cosine_topk

    emb = load_table(spark, "embeddings", sf_dir)
    q = emb.filter(F.col("vec_id") < 10)
    exact = {(r.query_id, r.neighbor_id)
             for r in cosine_topk(emb, q, k=5).collect()}
    print("IVF-PQ (codes partitioned by inverted list, pruned ADC search):")
    for flag, name in ((False, "flat"), (True, "residual")):
        path = os.path.join(work, f"ivfpq_{name}")
        ivfpq_write_index(
            emb, path, n_lists=8, m=8, k_codes=64, by_residual=flag
        )
        got = {
            (r.query_id, r.neighbor_id)
            for r in ivfpq_query_index(
                spark, path, q, k=5, n_probe=4, candidate_margin=32
            ).collect()
        }
        print(f"  {name:8s}: recall@5 vs brute force = "
              f"{len(exact & got) / len(exact):.2f} (n_probe=4 of 8 lists)")

    # --- BM25 incremental index + hybrid RRF ------------------------------
    from crowdsorsa_etl_spark.functions.text import normalize_text
    from crowdsorsa_etl_spark.operators.bm25 import (
        bm25_append_index,
        bm25_query_index,
        bm25_topk,
        rrf_fuse,
    )
    from crowdsorsa_etl_spark.operators.bm25 import bm25_write_index

    docs = load_table(spark, "documents", sf_dir)
    idx = os.path.join(work, "bm25")
    bm25_write_index(docs.filter(F.col("doc_id") % 2 == 0), idx)
    bm25_append_index(docs.filter(F.col("doc_id") % 2 == 1), idx)  # new slice
    queries = docs.filter(F.col("doc_id") < 3).select(
        F.col("doc_id").cast("int").alias("query_id"),
        F.array_join(
            F.slice(F.split(normalize_text(F.col("text")), " "), 1, 4), " "
        ).alias("text"),
    )
    merged = bm25_query_index(spark, idx, queries, k=10)
    rebuilt = bm25_topk(docs, queries, k=10)
    same = sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, rebuilt.collect())
    )
    print(f"BM25 append-only index: merged ≡ rebuilt → {same}")

    bm = merged.select("query_id", F.col("doc_id").alias("item_id"), "rank")
    cos = cosine_topk(emb, emb.filter(F.col("vec_id") < 3), k=10).select(
        F.col("query_id").cast("int").alias("query_id"),
        F.col("neighbor_id").alias("item_id"),
        "rank",
    )
    fused = rrf_fuse([bm, cos], top_n=5)
    print(f"hybrid RRF fusion: {fused.count()} fused rows "
          f"(top-5 per query across both retrievers)")

    # --- polygon-polygon grid join ----------------------------------------
    from crowdsorsa_etl_spark import parity_oracles
    from crowdsorsa_etl_spark.functions.geo import st_envelope, st_translate
    from crowdsorsa_etl_spark.operators.spatial import grid_polygon_join
    from crowdsorsa_etl_spark.schemas import OBSERVATIONS_2024

    d = parity_oracles.ensure_observation_fixtures()
    polys = (
        spark.read.schema(OBSERVATIONS_2024)
        .parquet(f"{d}/observations_2024.parquet")
        .select(F.col("tunniste").alias("a_id"),
                F.col("geometry_wkb").alias("a_wkb"))
    )
    env = polys.select("a_id", "a_wkb", st_envelope(F.col("a_wkb")).alias("e"))
    shifted = env.select(
        F.col("a_id").alias("b_id"),
        st_translate(
            F.col("a_wkb"),
            (F.col("e.xmax") - F.col("e.xmin")) / 2.0,
            (F.col("e.ymax") - F.col("e.ymin")) / 2.0,
        ).alias("b_wkb"),
    )
    pairs = grid_polygon_join(polys, shifted, cell_size=1000.0)
    print(f"polygon-polygon grid join: {pairs.count()} intersecting pairs "
          f"(originals vs half-extent-shifted copies)")

    # --- SCD2 with the bounded-disorder buffer ----------------------------
    from crowdsorsa_etl_spark.operators.scd import (
        scd2_apply_batch_buffered,
        scd2_flush_buffer,
    )

    events = load_table(spark, "events", sf_dir).select(
        "user_id", "ts", "event_type", "event_id"
    )
    lo, hi = events.agg(F.min("ts"), F.max("ts")).collect()[0]
    span = (hi - lo).total_seconds()
    mid = F.lit(lo) + F.expr(f"INTERVAL {span / 2.0} SECONDS")
    late = (F.col("event_id") % 5 == 0) & (F.col("ts") <= mid) & (
        F.col("ts") > mid - F.expr(f"INTERVAL {span / 8.0} SECONDS")
    )
    vd, bd = os.path.join(work, "scd2_v"), os.path.join(work, "scd2_b")
    kw = dict(key_cols=["user_id"], ts_col="ts",
              tracked_cols=["event_type"], tie_break_cols=["event_id"])
    scd2_apply_batch_buffered(
        spark, vd, bd, events.filter((F.col("ts") <= mid) & ~late),
        max_delay_seconds=span / 4.0, **kw,
    )
    scd2_apply_batch_buffered(
        spark, vd, bd, events.filter((F.col("ts") > mid) | late),
        max_delay_seconds=span / 4.0, **kw,
    )
    scd2_flush_buffer(spark, vd, bd, **kw)
    n = spark.read.parquet(vd).count()
    print(f"SCD2 disorder buffer: {n} versions after two scrambled batches "
          f"+ flush (identical to an ordered rebuild — q100's oracle gate)")

    spark.stop()
    print(f"\nall round-8 stages ran; work dir: {work}")


if __name__ == "__main__":
    main()
