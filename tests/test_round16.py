"""Round-16 operator gates: t-closeness EMD semantics on planted
distributions plus fixture invariants."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _write_documents(spark, tmp_path, rows):
    """Write a minimal documents fixture (doc_id, text, lang, source,
    n_chars) so governance queries can run against a planted corpus."""
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "documents.parquet")
    )
    return str(tmp_path)


class TestTCloseness:
    def test_planted_skewed_class_violates(self, spark, tmp_path):
        """One class holds only the longest docs while the corpus is
        spread across buckets: its prefix-sum EMD must trip t > 0.2.
        A class mirroring the corpus distribution must not."""
        from crowdsorsa_etl_spark.queries import QUERIES

        rows = []
        did = 0
        # background: source "mix" holds 32 docs evenly over 4 pow2
        # buckets (64, 128, 256, 512)
        for rep in range(8):
            for n in (40, 100, 200, 400):
                rows.append((did, "x", "en", "mix", n))
                did += 1
        # skewed: source "top" holds 8 docs, all in the 512 bucket
        for rep in range(8):
            rows.append((did, "x", "en", "top", 400))
            did += 1
        sf = _write_documents(spark, tmp_path, rows)
        out = {r["source"]: r for r in QUERIES["llm_t_closeness"](spark, sf).collect()}
        assert out["top"]["violates"] is True
        # corpus = mix + top; "mix" is close to the corpus distribution
        # (its cum shares differ from the corpus' by < 0.2 everywhere)
        assert out["mix"]["violates"] is False
        assert out["top"]["t_emd"] > out["mix"]["t_emd"]

    def test_uniform_corpus_has_zero_emd(self, spark, tmp_path):
        """Every class distributed exactly like the corpus => t = 0."""
        from crowdsorsa_etl_spark.queries import QUERIES

        rows = []
        did = 0
        for src in ("a", "b"):
            for rep in range(4):
                for n in (40, 100):
                    rows.append((did, "x", "en", src, n))
                    did += 1
        sf = _write_documents(spark, tmp_path, rows)
        for r in QUERIES["llm_t_closeness"](spark, sf).collect():
            assert r["emd_num"] == 0
            assert r["violates"] is False

    def test_fixture_invariants(self, spark):
        """On the real fixture: t in [0, 1], exact-integer flag agrees
        with the ratio, denominators carry n_docs * n_total * (m-1)."""
        from crowdsorsa_etl_spark.queries import QUERIES

        rows = QUERIES["llm_t_closeness"](spark, SF_DIR).collect()
        assert rows
        for r in rows:
            assert 0 <= r["emd_num"] <= r["emd_den"]
            assert r["violates"] == (r["emd_num"] * 5 > r["emd_den"])
            assert abs(r["t_emd"] - r["emd_num"] / r["emd_den"]) < 1e-6
