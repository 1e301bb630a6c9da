"""Epoch re-shuffle (operators/epochshuffle.py): bijectivity of the
swap-or-not permutation, epoch decorrelation, and the read-only-store
contract behind llm_epoch_reshuffle."""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from crowdsorsa_etl_spark.operators.epochshuffle import (
    _bit_seed,
    _round_constant,
    epoch_manifest,
    epoch_perm_cte_sql,
    with_epoch_pos,
)
from crowdsorsa_etl_spark.operators.sharding import (
    shard_manifest,
    shard_store_init,
)


def _perm_py(x: int, n: int, epoch: int, seed: str, rounds: int = 10) -> int:
    """Pure-python reference of the same permutation (the third engine the
    Spark plan and the DuckDB oracle are both held against)."""
    for r in range(rounds):
        k = _round_constant(seed, epoch, r, n)
        partner = (k - x) % n
        m = max(x, partner)
        bit = (
            int(
                hashlib.md5(
                    f"{_bit_seed(seed, epoch, r)},{m}".encode()
                ).hexdigest()[:15],
                16,
            )
            % 2
        )
        x = partner if bit == 1 else x
    return x


class TestPermutationProperties:
    @given(
        n=st.integers(min_value=1, max_value=2000),
        epoch=st.integers(min_value=0, max_value=50),
    )
    @settings(max_examples=60, deadline=None)
    def test_bijective_for_any_domain_and_epoch(self, n, epoch):
        image = {_perm_py(x, n, epoch, "shuf:v1:") for x in range(n)}
        assert image == set(range(n))

    def test_epochs_are_decorrelated(self):
        n = 512
        e1 = [_perm_py(x, n, 1, "shuf:v1:") for x in range(n)]
        e2 = [_perm_py(x, n, 2, "shuf:v1:") for x in range(n)]
        assert e1 != e2
        # neither epoch is the identity (stored order) ...
        assert e1 != list(range(n)) and e2 != list(range(n))
        # ... and agreement between epochs is near the 1/n chance level
        agree = sum(a == b for a, b in zip(e1, e2))
        assert agree < n * 0.05

    def test_spark_matches_python_reference(self, spark):
        n = 300
        df = with_epoch_pos(
            spark.range(n).select(F.col("id").alias("pos")),
            "pos",
            n,
            3,
            "shuf:v1:",
        )
        got = {r["pos"]: r["epos"] for r in df.collect()}
        assert got == {x: _perm_py(x, n, 3, "shuf:v1:") for x in range(n)}

    def test_duckdb_cte_chain_matches_python_reference(self):
        import duckdb

        n = 300
        defs, final = epoch_perm_cte_sql(
            "base", "orig", "orig", str(n), 3, "shuf:v1:"
        )
        q = (
            f"WITH base AS (SELECT x AS orig FROM range({n}) t(x)),\n"
            f"{defs}\nSELECT orig, x FROM {final}"
        )
        got = dict(duckdb.sql(q).fetchall())
        assert got == {x: _perm_py(x, n, 3, "shuf:v1:") for x in range(n)}

    def test_no_exchange_in_remap_plan(self, spark):
        # the permutation is row-local: remapping positions must add zero
        # shuffles on top of the scan
        df = with_epoch_pos(
            spark.range(100).select(F.col("id").alias("pos")),
            "pos",
            100,
            1,
            "shuf:v1:",
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


class TestEpochManifestStore:
    @pytest.fixture()
    def root(self, spark):
        d = tempfile.mkdtemp(prefix="epochstore_")
        ids = spark.createDataFrame(
            [(i,) for i in range(200)], "doc_id long"
        )
        shard_store_init(ids, f"{d}/s", shard_docs=16)
        yield f"{d}/s"
        shutil.rmtree(d, ignore_errors=True)

    @staticmethod
    def _fingerprint(root):
        out = {}
        for base, _, files in os.walk(root):
            for f in files:
                p = os.path.join(base, f)
                st_ = os.stat(p)
                out[p] = (st_.st_size, st_.st_mtime_ns)
        return out

    def test_store_is_read_only_and_epochs_conserve_docs(self, spark, root):
        before = self._fingerprint(root)
        m1 = epoch_manifest(spark, root, 1, shard_docs=16).collect()
        m2 = epoch_manifest(spark, root, 2, shard_docs=16).collect()
        assert self._fingerprint(root) == before  # no byte rewritten
        # every epoch still holds all 200 docs in full shards
        for m in (m1, m2):
            assert sum(r["n_docs"] for r in m) == 200
            assert all(r["n_docs"] == 16 for r in m if r["eshard_id"] < 12)
        # and the two epoch orders differ from each other AND from epoch 0
        chains1 = {r["eshard_id"]: r["id_chain_md5"] for r in m1}
        chains2 = {r["eshard_id"]: r["id_chain_md5"] for r in m2}
        assert chains1 != chains2
        stored = {
            r["shard_id"]: r["id_chain_md5"]
            for r in shard_manifest(spark, root).collect()
        }
        assert chains1 != stored and chains2 != stored
