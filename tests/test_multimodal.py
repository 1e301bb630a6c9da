"""Multimodal binary-column plumbing over the documents fixture."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crowdsorsa_etl_spark.operators.multimodal import (
    attach_binary_payload,
    decode_images,
    sample_frames,
)
from crowdsorsa_etl_spark.sources.parquet import load_table

SF_DIR = "/root/testdata/sf0.001"


class TestMultimodal:
    def test_unknown_format_marked_unsupported_without_fake(self, spark):
        docs = load_table(spark, "documents", SF_DIR).limit(5)
        payloads = attach_binary_payload(docs)  # fake \x89IMG magic, not PNG
        rows = decode_images(payloads).collect()
        assert len(rows) == 5
        for r in rows:
            assert r.format == "unsupported"
            assert r.width is None and r.mean_luma is None
            assert r.n_bytes > 4  # byte length still reported

    def test_real_png_decode_end_to_end(self, spark):
        from crowdsorsa_etl_spark.operators.multimodal import attach_png_payload

        docs = load_table(spark, "documents", SF_DIR).limit(20)
        rows = decode_images(attach_png_payload(docs)).collect()
        assert len(rows) == 20
        for r in rows:
            assert r.format == "png"
            assert r.width == 8 and r.height >= 1
            # pixels are utf-8 text bytes (printable ASCII) zero-padded
            assert 0.0 < r.mean_luma < 0.5

    def test_fake_decode_full_plumbing(self, spark):
        docs = load_table(spark, "documents", SF_DIR).limit(20)
        payloads = attach_binary_payload(docs)
        meta = decode_images(payloads, allow_fake=True)
        rows = meta.collect()
        assert len(rows) == 20
        for r in rows:
            assert r.format == "fake-img"
            assert r.n_bytes > 4
            assert 1 <= r.width <= 640 and 1 <= r.height <= 480
            assert 0.0 <= r.mean_luma <= 1.0

    def test_decode_deterministic(self, spark):
        docs = load_table(spark, "documents", SF_DIR).limit(10)
        p = attach_binary_payload(docs)
        a = {r.doc_id: r.mean_luma for r in decode_images(p, allow_fake=True).collect()}
        b = {r.doc_id: r.mean_luma for r in decode_images(p, allow_fake=True).collect()}
        assert a == b

    def test_frame_sampling(self, spark):
        docs = load_table(spark, "documents", SF_DIR).limit(5)
        payloads = attach_binary_payload(docs)
        frames = sample_frames(payloads, every_n_bytes=64, max_frames=4)
        rows = frames.collect()
        assert all(0 <= r.frame_idx < 4 for r in rows)
        assert all(1 <= len(r.frame_bytes) <= 64 for r in rows)
        # per-doc frame indices are dense from 0
        by_doc: dict[int, list[int]] = {}
        for r in rows:
            by_doc.setdefault(r.doc_id, []).append(r.frame_idx)
        for idxs in by_doc.values():
            assert sorted(idxs) == list(range(len(idxs)))


class TestResizeAndFeatures:
    def test_resize_hits_byte_budget(self, spark):
        from crowdsorsa_etl_spark.operators.multimodal import (
            attach_binary_payload,
            resize_images,
        )
        from crowdsorsa_etl_spark.sources.parquet import load_table

        docs = load_table(spark, "documents", "/root/testdata/sf0.001")
        out = resize_images(
            attach_binary_payload(docs), width=64, height=64, allow_fake=True
        )
        rows = out.collect()
        assert rows and all(len(r.payload) == (64 * 64) // 64 for r in rows)
        assert all(r.width == 64 and r.height == 64 for r in rows)

    def test_resize_unknown_format_null_without_fake(self, spark):
        from crowdsorsa_etl_spark.operators.multimodal import resize_images

        df = spark.createDataFrame([(1, b"x")], "doc_id long, payload binary")
        rows = resize_images(df, width=8, height=8).collect()
        assert rows[0].payload is None  # not an exception mid-job

    def test_resize_real_png_roundtrip(self, spark):
        from crowdsorsa_etl_spark.functions import imagecodec
        from crowdsorsa_etl_spark.operators.multimodal import (
            attach_png_payload,
            resize_images,
        )

        docs = load_table(spark, "documents", SF_DIR).limit(8)
        out = resize_images(attach_png_payload(docs), width=16, height=16)
        rows = out.collect()
        assert len(rows) == 8
        for r in rows:
            fmt, px = imagecodec.decode_image(bytes(r.payload))
            assert fmt == "png"
            assert px.shape[:2] == (16, 16)

    def test_features_compose_with_similarity_search(self, spark):
        from crowdsorsa_etl_spark.operators.multimodal import (
            attach_binary_payload,
            extract_features,
        )
        from crowdsorsa_etl_spark.operators.similarity import cosine_topk
        from crowdsorsa_etl_spark.sources.parquet import load_table

        docs = load_table(spark, "documents", "/root/testdata/sf0.001")
        emb = extract_features(attach_binary_payload(docs), dim=16)
        first = emb.first()
        assert len(first.embedding) == 16
        # unit-norm embeddings
        assert abs(sum(x * x for x in first.embedding) - 1.0) < 1e-5
        # the multimodal embedding column drops straight into the ANN tier
        q = emb.limit(3)
        out = cosine_topk(emb, q, k=3)
        assert out.count() == 9
        # exact duplicate payloads (duplicate texts exist in the fixture)
        # must be each other's top neighbor with cosine 1.0
        top = out.filter(F.col("rank") == 1).first()
        assert top.cosine <= 1.0
