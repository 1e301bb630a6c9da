#!/usr/bin/env python
"""The round-18 drift/monitoring + sampling tier in one flow — what a
production training-data pipeline runs BETWEEN crawl snapshots, wired
end to end:

    documents → PSI per category  (which slice moved? smoothed, unbounded)
              → JSD per category  (bounded ≤ ln 2, smoothing-free)
              → exact two-sample KS on the length metric
              → sketch-KS with its loss measured in-row (the 100 TB path)
              → n-gram novelty vs the reference half (index anti-join)
              → CUSUM changepoint over the daily ingest rate
    health    → Hill tail index (is the vocabulary still Zipfian?)
              → per-language robust median/MAD outlier counts
              → per-source ≥2%-share tokens (grouped Misra-Gries)
              → k-core membership of the dup graph (template farms)
    selection → Neyman allocation (how many docs per stratum?)
              → A-ES weighted reservoir (which docs, weight = length)
              → within-source percent-rank calibration
    live      → start_psi_stream: the same PSI scored per micro-batch
                epoch against a frozen reference distribution

Usage: python examples/run_drift_tier.py [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from crowdsorsa_etl_spark.queries import QUERIES
from crowdsorsa_etl_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="drift_tier_demo")

    print("== snapshot drift gates ==")
    for name in (
        "q120_psi_drift",
        "q123_jsd_drift",
        "q121_ks_drift",
        "llm_ks_sketch",
        "llm_ngram_novelty",
    ):
        print(f"-- {name}")
        QUERIES[name](spark, sf_dir).show(6, truncate=False)

    print("== ingest-rate changepoint (peak day flagged) ==")
    QUERIES["q122_cusum_days"](spark, sf_dir).filter(
        F.col("is_peak")
    ).show(truncate=False)

    print("== corpus health ==")
    for name in (
        "llm_hill_tail",
        "q124_robust_outliers",
        "llm_source_heavy_hitters",
        "llm_kcore_filter",
    ):
        print(f"-- {name}")
        QUERIES[name](spark, sf_dir).show(6, truncate=False)

    print("== sample selection ==")
    for name in (
        "llm_neyman_allocation",
        "llm_weighted_reservoir",
        "llm_source_percentile",
    ):
        print(f"-- {name}")
        QUERIES[name](spark, sf_dir).show(6, truncate=False)

    print("== live PSI stream (3 arrival batches vs frozen reference) ==")
    from crowdsorsa_etl_spark.queries._shared import _t
    from crowdsorsa_etl_spark.streaming.pipeline import start_psi_stream

    docs = _t(spark, sf_dir, "documents")
    ref = {
        r["lang"]: r["n"]
        for r in docs.filter(F.col("doc_id") % 2 == 0)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    work = tempfile.mkdtemp(prefix="drift_demo_")
    try:
        src = os.path.join(work, "feed")
        os.makedirs(src)
        for i in range(3):
            staging = os.path.join(work, f"_s{i}")
            docs.select("doc_id", "lang").filter(
                F.col("doc_id") % 3 == i
            ).coalesce(1).write.mode("overwrite").parquet(staging)
            part = [
                f for f in os.listdir(staging) if f.endswith(".parquet")
            ][0]
            os.rename(
                os.path.join(staging, part),
                os.path.join(src, f"b{i}.parquet"),
            )
        store = os.path.join(work, "store")
        q = start_psi_stream(
            spark.readStream.schema("doc_id long, lang string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src),
            store,
            checkpoint_dir=os.path.join(work, "ckpt"),
            category_col="lang",
            ref_counts=ref,
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        for d in sorted(os.listdir(store)):
            if d.startswith("epoch="):
                row = (
                    spark.read.schema(
                        "n_rows bigint, n_categories int,"
                        " psi_micro bigint, psi double"
                    )
                    .parquet(os.path.join(store, d, "summary"))
                    .collect()[0]
                )
                print(
                    f"  {d}: rows={row['n_rows']}"
                    f" psi={row['psi']} (micro={row['psi_micro']})"
                )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    spark.stop()
    print("drift tier demo complete")


if __name__ == "__main__":
    main()
