"""Round-15 query invariants beyond the hash oracles: conservation laws
and structural contracts the differential gate can't express."""

from __future__ import annotations

from pyspark.sql import functions as F

from crowdsorsa_etl_spark.queries import QUERIES
from crowdsorsa_etl_spark.sources.parquet import load_table

SF_DIR = "/root/testdata/sf0.001"


class TestTemperatureMixInvariants:
    def test_shares_sum_to_one_and_budget_conserved(self, spark):
        rows = QUERIES["llm_source_temperature_mix"](spark, SF_DIR).collect()
        assert abs(sum(r["share_raw"] for r in rows) - 1.0) < 1e-4
        assert abs(sum(r["share_alpha"] for r in rows) - 1.0) < 1e-4
        total = sum(r["n_tokens"] for r in rows)
        budget = sum(r["epoch_factor"] * r["n_tokens"] for r in rows)
        # Σ rate_i · n_i == the corpus-total budget (conservation)
        assert abs(budget - total) / total < 1e-4

    def test_temperature_flattens_toward_uniform(self, spark):
        # alpha < 1 must shrink the head's share and grow the tail's
        rows = QUERIES["llm_source_temperature_mix"](spark, SF_DIR).collect()
        head = max(rows, key=lambda r: r["n_tokens"])
        tail = min(rows, key=lambda r: r["n_tokens"])
        assert head["share_alpha"] < head["share_raw"]
        assert tail["share_alpha"] > tail["share_raw"]
        # and epoch factors move opposite: head < 1, tail > 1
        assert head["epoch_factor"] < 1.0 < tail["epoch_factor"]


class TestReservoirInvariants:
    def test_exactly_min_k_or_stratum_size(self, spark):
        docs = load_table(spark, "documents", SF_DIR)
        sizes = {
            (r["lang"], r["source"]): r["n"]
            for r in docs.groupBy("lang", "source")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        got = {}
        for r in QUERIES["llm_reservoir_sample_k"](spark, SF_DIR).collect():
            got[(r["lang"], r["source"])] = (
                got.get((r["lang"], r["source"]), 0) + 1
            )
        assert set(got) == set(sizes)
        for key, n in sizes.items():
            assert got[key] == min(3, n), key


class TestShuffleShardInvariants:
    def test_all_shards_full_except_last(self, spark):
        rows = sorted(
            (r["shard_id"], r["n_docs"])
            for r in QUERIES["llm_train_shuffle_shards"](
                spark, SF_DIR
            ).collect()
        )
        ids = [s for s, _ in rows]
        assert ids == list(range(len(ids)))  # contiguous from 0
        assert all(n == 64 for _, n in rows[:-1])
        assert 1 <= rows[-1][1] <= 64

    def test_quality_diversity_bounds(self, spark):
        n_src = load_table(spark, "documents", SF_DIR).select(
            "source"
        ).distinct().count()
        for r in QUERIES["llm_shuffle_quality"](spark, SF_DIR).collect():
            d = r["simpson_diversity"]
            # 0 <= 1 - Σp² <= 1 - 1/k for k sources
            assert 0.0 <= d <= 1.0 - 1.0 / n_src + 1e-9
            assert 1 <= r["n_sources"] <= n_src


class TestSoftDedupInvariants:
    def test_weight_mass_equals_cluster_count(self, spark):
        rows = QUERIES["llm_soft_dedup_weights"](spark, SF_DIR).collect()
        n_clusters = len({r["cluster_id"] for r in rows})
        mass = sum(r["weight"] for r in rows)
        # Σ 1/|c| over members == one unit per cluster — soft dedup keeps
        # exactly the mass a hard-dedup corpus would have
        assert abs(mass - n_clusters) < 1e-3
        singles = [r for r in rows if r["cluster_size"] == 1]
        assert all(r["weight"] == 1.0 for r in singles)
