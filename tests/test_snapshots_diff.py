"""Versioned snapshots (time travel) + CDC table diff + int8 quantization."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crowdsorsa_etl_spark.operators.diff import diff_summary, table_diff
from crowdsorsa_etl_spark.sinks.snapshots import (
    SnapshotConflictError,
    snapshot_read,
    snapshot_repair,
    snapshot_vacuum,
    snapshot_versions,
    snapshot_write,
)
from crowdsorsa_etl_spark.sources.parquet import load_table

SF_DIR = "/root/testdata/sf0.001"


class TestSnapshots:
    def test_write_read_time_travel(self, spark, tmp_path):
        path = str(tmp_path / "tbl")
        docs = load_table(spark, "documents", SF_DIR)
        v1 = snapshot_write(docs.limit(100), path)
        v2 = snapshot_write(docs.limit(200), path)
        assert (v1, v2) == (1, 2)
        assert snapshot_versions(path) == [1, 2]
        assert snapshot_read(spark, path).count() == 200  # current
        assert snapshot_read(spark, path, version=1).count() == 100
        with pytest.raises(ValueError):
            snapshot_read(spark, path, version=9)

    def test_vacuum_keeps_newest_and_current(self, spark, tmp_path):
        path = str(tmp_path / "tbl2")
        docs = load_table(spark, "documents", SF_DIR)
        for n in (10, 20, 30, 40):
            snapshot_write(docs.limit(n), path)
        removed = snapshot_vacuum(path, keep_last=2)
        assert removed == [1, 2]
        assert snapshot_versions(path) == [3, 4]
        assert snapshot_read(spark, path).count() == 40
        with pytest.raises(ValueError):
            snapshot_read(spark, path, version=1)

    def test_crash_before_pointer_flip_keeps_previous_version(
        self, spark, tmp_path
    ):
        # simulate: v2 data dir written but manifest never flipped
        path = str(tmp_path / "tbl3")
        docs = load_table(spark, "documents", SF_DIR)
        snapshot_write(docs.limit(50), path)
        docs.limit(75).write.parquet(str(tmp_path / "tbl3" / "v=2"))  # orphan
        assert snapshot_read(spark, path).count() == 50  # pointer still v1
        assert snapshot_versions(path) == [1]

    def test_concurrent_writers_one_wins_one_raises(
        self, spark, tmp_path, monkeypatch
    ):
        """Two writers that both saw current == N race the claim for N+1:
        exactly one commits, the other raises instead of clobbering, and no
        orphan version directory is left behind. The lost-update
        interleaving is forced deterministically: both threads' FIRST
        manifest reads rendezvous at a barrier before either claims."""
        import os
        import threading

        from crowdsorsa_etl_spark.sinks import snapshots as snap_mod

        path = str(tmp_path / "tbl4")
        docs = load_table(spark, "documents", SF_DIR)
        snapshot_write(docs.limit(10), path)  # current == 1

        barrier = threading.Barrier(2)
        lock = threading.Lock()
        gated = []
        orig_read = snap_mod._read_manifest

        def gated_read(p):
            m = orig_read(p)
            with lock:
                gate_me = len(gated) < 2
                gated.append(1)
            if gate_me:  # only the two initial reads rendezvous
                barrier.wait(timeout=30)
            return m

        monkeypatch.setattr(snap_mod, "_read_manifest", gated_read)
        outcomes: list[tuple[str, object]] = []

        def writer(n: int) -> None:
            try:
                outcomes.append(("ok", snapshot_write(docs.limit(n), path)))
            except SnapshotConflictError as e:
                outcomes.append(("conflict", e))

        threads = [
            threading.Thread(target=writer, args=(n,)) for n in (20, 30)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()

        kinds = sorted(k for k, _ in outcomes)
        assert kinds == ["conflict", "ok"]
        assert snapshot_versions(path) == [1, 2]
        assert snapshot_read(spark, path).count() in (20, 30)
        # no orphan directories: only v=1, v=2 exist
        vdirs = sorted(
            d for d in os.listdir(path) if d.startswith("v=")
        )
        assert vdirs == ["v=1", "v=2"]

    def test_repair_clears_dead_writer_claim(self, spark, tmp_path):
        path = str(tmp_path / "tbl5")
        docs = load_table(spark, "documents", SF_DIR)
        snapshot_write(docs.limit(10), path)
        # simulate a writer that claimed v2 then died before the flip
        import os

        open(os.path.join(path, "_v2.claim"), "w").close()
        docs.limit(20).write.parquet(os.path.join(path, "v=2"))
        with pytest.raises(SnapshotConflictError):
            snapshot_write(docs.limit(30), path)
        assert snapshot_repair(path) == [2]
        assert snapshot_write(docs.limit(30), path) == 2
        assert snapshot_read(spark, path).count() == 30


class TestTableDiff:
    def test_classifies_all_change_types(self, spark):
        docs = load_table(spark, "documents", SF_DIR)
        old = docs
        new = (
            docs.filter(F.col("doc_id") % 10 != 0)  # removed
            .withColumn(
                "text",
                F.when(F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit(" EDITED")))
                .otherwise(F.col("text")),
            )
            .unionByName(docs.limit(5).select(
                (F.col("doc_id") + 1_000_000).alias("doc_id"),
                "text", "lang", "source", "n_chars",
            ))  # added
        )
        d = table_diff(old, new, ["doc_id"])
        counts = {r.change_type: r.n for r in diff_summary(d).collect()}
        n = docs.count()
        assert counts["removed"] == docs.filter("doc_id % 10 = 0").count()
        assert counts["added"] == 5
        assert counts["changed"] == docs.filter(
            "doc_id % 7 = 0 AND doc_id % 10 != 0"
        ).count()
        assert "unchanged" not in counts

    def test_include_unchanged_and_null_safety(self, spark):
        old = spark.createDataFrame(
            [(1, None), (2, "x")], "id long, val string"
        )
        new = spark.createDataFrame(
            [(1, None), (2, None)], "id long, val string"
        )
        d = table_diff(old, new, ["id"], include_unchanged=True)
        got = {r.id: r.change_type for r in d.collect()}
        assert got == {1: "unchanged", 2: "changed"}  # NULL==NULL is unchanged

    def test_compose_with_snapshots(self, spark, tmp_path):
        path = str(tmp_path / "versions")
        docs = load_table(spark, "documents", SF_DIR)
        snapshot_write(docs.limit(100), path)
        snapshot_write(docs.limit(80), path)
        d = table_diff(
            snapshot_read(spark, path, version=1),
            snapshot_read(spark, path, version=2),
            ["doc_id"],
        )
        counts = {r.change_type: r.n for r in diff_summary(d).collect()}
        assert counts == {"removed": 20}


class TestQuantizedANN:
    def test_quantization_bounds_and_dequant_error(self, spark):
        from crowdsorsa_etl_spark.operators.quantize import quantize_embeddings

        emb = load_table(spark, "embeddings", SF_DIR)
        q = quantize_embeddings(emb)
        rows = q.limit(50).collect()
        orig = {r.vec_id: r.embedding for r in emb.limit(50).collect()}
        for r in rows:
            assert all(-127 <= v <= 127 for v in r.qvec)
            if r.scale > 0:
                deq = [v / r.scale for v in r.qvec]
                err = max(
                    abs(a - b) for a, b in zip(orig[r.vec_id], deq)
                )
                assert err <= 0.5 / r.scale + 1e-9  # half-ulp of the grid

    def test_recall_vs_exact_cosine(self, spark):
        from crowdsorsa_etl_spark.operators.quantize import (
            cosine_topk_quantized,
            quantize_embeddings,
        )
        from crowdsorsa_etl_spark.operators.similarity import cosine_topk

        emb = load_table(spark, "embeddings", SF_DIR).localCheckpoint()
        queries = emb.limit(5)
        exact = cosine_topk(emb, queries, k=10)
        qemb = quantize_embeddings(emb).localCheckpoint()
        qq = cosine_topk_quantized(qemb, quantize_embeddings(queries), k=10)
        exact_sets = {}
        for r in exact.collect():
            exact_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
        hit = tot = 0
        for r in qq.collect():
            tot += 1
            hit += r.vec_id in exact_sets.get(r.query_id, set())
        assert tot == 50
        assert hit / tot >= 0.9  # int8 barely moves 16-dim cosine ranks
