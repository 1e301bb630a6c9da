"""Multimodal binary-column plumbing over the documents fixture."""

from __future__ import annotations

import pytest

from crowdsorsa_etl_spark.operators.multimodal import (
    attach_binary_payload,
    decode_images,
    sample_frames,
)
from crowdsorsa_etl_spark.sources.parquet import load_table

SF_DIR = "/root/testdata/sf0.001"


class TestMultimodal:
    def test_decode_requires_codec_or_fake(self, spark):
        docs = load_table(spark, "documents", SF_DIR).limit(5)
        payloads = attach_binary_payload(docs)
        with pytest.raises(NotImplementedError):
            decode_images(payloads)  # PIL absent in this image

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
