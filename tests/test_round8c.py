"""Round-8c operator gates: token-budget quota sampling, PSI drift,
frequent-pair mining semantics."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from crowdsorsa_etl_spark.operators.curation import token_budget_sample

SF_DIR = "/root/testdata/sf0.001"


class TestTokenBudgetSample:
    def _df(self, spark):
        rows = [(i, "g", 100) for i in range(10)]  # 1000 tokens total
        return spark.createDataFrame(rows, ["doc_id", "source", "n_tokens"])

    def test_crossing_doc_taken_whole_then_stop(self, spark):
        out = token_budget_sample(self._df(spark), {"g": 450}).collect()
        kept = [r for r in out if r.kept]
        # 100-token docs against a 450 budget: docs starting at cum 0, 100,
        # 200, 300, 400 are admitted (the 5th crosses the line and is taken
        # whole); the 6th starts at 500 >= 450 and is dropped
        assert len(kept) == 5
        assert max(r.cum_tokens for r in kept) == 500

    def test_admission_order_is_md5_deterministic(self, spark):
        a = token_budget_sample(self._df(spark), {"g": 450})
        b = token_budget_sample(self._df(spark), {"g": 450})
        assert {r.doc_id for r in a.collect() if r.kept} == {
            r.doc_id for r in b.collect() if r.kept
        }

    def test_unbudgeted_group_drops_everything(self, spark):
        rows = [(1, "other", 10)]
        df = spark.createDataFrame(rows, ["doc_id", "source", "n_tokens"])
        out = token_budget_sample(df, {"g": 100}).collect()
        assert not out[0].kept

    def test_kept_flag_equals_start_before_budget_rule(self, spark):
        # the admission rule is exactly (cum - own) < budget — strict at the
        # boundary — regardless of the md5 admission order
        rows = [(i, "g", t) for i, t in enumerate([5, 0, 3, 7, 0, 5])]
        df = spark.createDataFrame(rows, ["doc_id", "source", "n_tokens"])
        for r in token_budget_sample(df, {"g": 5}).collect():
            assert r.kept == ((r.cum_tokens - r.n_tokens) < 5)


class TestDriftPsi:
    def test_identical_slices_give_zero_psi(self, spark):
        from crowdsorsa_etl_spark.queries import QUERIES

        # fixture slices are statistically close: psi must be small but the
        # gate here is structural — 10 bins, one psi_total value everywhere
        out = QUERIES["q106_drift_psi"](spark, SF_DIR).collect()
        assert len(out) <= 10
        totals = {r.psi_total for r in out}
        assert len(totals) == 1
        assert abs(next(iter(totals))) < 1.0

    def test_psi_math_on_known_histogram(self, spark):
        # hand-check the smoothed formula on a 2-bin synthetic: expected
        # (90, 10), actual (50, 50)
        pe = [(90 + 1) / (100 + 10), (10 + 1) / (100 + 10)]
        pa = [(50 + 1) / (100 + 10), (50 + 1) / (100 + 10)]
        want = sum((a - e) * math.log(a / e) for a, e in zip(pa, pe))
        assert want > 0.5  # a drift this large must alarm


class TestFrequentPairs:
    def test_exact_supports_and_lift(self, spark):
        from crowdsorsa_etl_spark.queries._shared import QUERIES

        rows = [
            (0, "milk bread beer", "en", "s", 15),
            (1, "milk bread", "en", "s", 10),
            (2, "milk beer", "en", "s", 9),
            (3, "milk bread beer", "en", "s", 15),
            (4, "water", "en", "s", 5),
        ]
        df = spark.createDataFrame(
            rows, ["doc_id", "text", "lang", "source", "n_chars"]
        )
        path = "/tmp/test_r8c_docs.parquet"
        df.write.mode("overwrite").parquet(path)

        import os
        import shutil

        d = "/tmp/test_r8c_sf"
        os.makedirs(d, exist_ok=True)
        dst = os.path.join(d, "documents.parquet")
        shutil.rmtree(dst, ignore_errors=True)
        shutil.copytree(path, dst)
        out = {
            (r.tok_a, r.tok_b): (r.support, r.lift)
            for r in QUERIES["q107_frequent_pairs"](spark, d).collect()
        }
        # n=5 docs; items at >=25% support (>=2 docs): milk 4, bread 3, beer 3
        # pairs at >=10% (>=1): all among those items
        assert out[("bread", "milk")][0] == 3
        assert out[("beer", "milk")][0] == 3
        assert out[("beer", "bread")][0] == 2
        # 'water' (support 1 < 2) pruned by the apriori item cut
        assert all("water" not in p for p in out)
        # lift(beer, bread) = 5 * 2 / (3*3)
        assert out[("beer", "bread")][1] == round(10 / 9, 6)

    def test_fixture_pairs_bounded_by_item_cut(self, spark):
        from crowdsorsa_etl_spark.queries import QUERIES

        out = QUERIES["q107_frequent_pairs"](spark, SF_DIR)
        rows = out.collect()
        assert rows  # word-salad corpus has frequent pairs
        assert all(r.tok_a < r.tok_b for r in rows)


class TestRound8cPlans:
    def test_setsim_join_no_cartesian_and_sortmerge_or_hash(self, spark):
        from crowdsorsa_etl_spark.queries import QUERIES

        plan = (
            QUERIES["llm_setsim_join"](spark, SF_DIR)
            ._jdf.queryExecution()
            .toString()
        )
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_frequent_pairs_broadcasts_item_dimension(self, spark):
        from crowdsorsa_etl_spark.queries import QUERIES

        plan = (
            QUERIES["q107_frequent_pairs"](spark, SF_DIR)
            ._jdf.queryExecution()
            .toString()
        )
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan

    def test_token_budget_mix_single_window_exchange(self, spark):
        from crowdsorsa_etl_spark.queries import QUERIES

        df = QUERIES["llm_token_budget_mix"](spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        # one hash-partitioned exchange feeding the per-source window
        assert plan.count("Exchange hashpartitioning") == 1
        assert "Window" in plan

    def test_bpe_plan_has_no_python_stages(self, spark):
        from crowdsorsa_etl_spark.queries import QUERIES

        plan = (
            QUERIES["llm_bpe_merges"](spark, SF_DIR)
            ._jdf.queryExecution()
            .toString()
        )
        assert "EvalPython" not in plan
        assert "MapInPandas" not in plan
