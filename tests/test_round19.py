"""Round-19 tier: drift panel, rich-vocabulary gates, streaming CUSUM,
and the multi-weight global cumsum that de-single-partitions q121.

Each test is an INDEPENDENT recompute (pure Python / alternative plan)
of the registered query's contract, complementing the DuckDB hash
oracles the sweep runs.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from crowdsorsa_etl_spark.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# q125_drift_panel — the panel must agree column-for-column with the
# separately-registered q120 (PSI) and q123 (JSD) outputs: the shared
# grid builder changed their plumbing, these assertions pin that it
# changed nothing about their arithmetic.
# ---------------------------------------------------------------------------


class TestDriftPanel:
    def test_panel_equals_q120_and_q123(self, spark):
        panel = {
            r["lang"]: r.asDict()
            for r in QUERIES["q125_drift_panel"](spark, SF_DIR).collect()
        }
        psi = {
            r["lang"]: r.asDict()
            for r in QUERIES["q120_psi_drift"](spark, SF_DIR).collect()
        }
        jsd = {
            r["lang"]: r.asDict()
            for r in QUERIES["q123_jsd_drift"](spark, SF_DIR).collect()
        }
        assert set(panel) == set(psi) == set(jsd)
        for lang, row in panel.items():
            for col in ("n_ref", "n_cur", "log_ratio", "psi_term",
                        "psi_micro"):
                assert row[col] == psi[lang][col], (lang, col)
            for col in ("tp_micro", "tq_micro", "jsd_term"):
                assert row[col] == jsd[lang][col], (lang, col)

    def test_panel_adds_no_scan_over_q120_alone(self, spark):
        """'One scan where there were two': emitting BOTH term families
        from the shared grid must cost exactly as many corpus scans as
        q120 alone — the JSD columns ride the same aggregation."""

        def n_scans(df):
            plan = df._jdf.queryExecution().executedPlan().toString()
            return plan.count("documents.parquet")

        panel = n_scans(QUERIES["q125_drift_panel"](spark, SF_DIR))
        psi_only = n_scans(QUERIES["q120_psi_drift"](spark, SF_DIR))
        jsd_only = n_scans(QUERIES["q123_jsd_drift"](spark, SF_DIR))
        assert panel == psi_only
        assert panel < psi_only + jsd_only


# ---------------------------------------------------------------------------
# Rich-vocabulary corpus: deterministic, engine-portable, and actually
# rich — the properties that clear the 31-word fixture ceiling.
# ---------------------------------------------------------------------------


class TestRichVocabulary:
    def _words(self, spark):
        from crowdsorsa_etl_spark.queries.round19_pack import (
            _rich_words_spark,
        )
        from crowdsorsa_etl_spark.queries._shared import _t

        docs = _t(spark, SF_DIR, "documents")
        return docs.select(F.explode(_rich_words_spark()).alias("w"))

    def test_vocabulary_is_rich_and_deterministic(self, spark):
        words = self._words(spark)
        n_distinct = words.distinct().count()
        assert n_distinct >= 1000  # the whole point of the tier
        # deterministic: a second derivation is row-identical
        counts = words.groupBy("w").count()
        again = self._words(spark).groupBy("w").count()
        assert counts.exceptAll(again).count() == 0

    def test_matches_duckdb_derivation(self, spark):
        """Spark and DuckDB derive the IDENTICAL token multiset — the
        portability claim behind every rich-tier oracle."""
        import duckdb

        from crowdsorsa_etl_spark.queries.round19_pack import (
            _rich_words_sql,
        )

        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM "
            f"'{SF_DIR}/documents.parquet'"
        )
        duck = dict(
            con.execute(
                f"SELECT w, count(*) FROM (SELECT unnest({_rich_words_sql()})"
                " AS w FROM documents) GROUP BY w"
            ).fetchall()
        )
        ours = {
            r["w"]: r["n"]
            for r in self._words(spark)
            .groupBy("w")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert ours == duck

    def test_rank_distribution_is_decreasing_in_rank(self, spark):
        """P(r) ∝ H_W − H_{r−1} is strictly decreasing in r: realized
        counts, bucketed by rank decile, must be non-increasing."""
        words = self._words(spark)
        counts = {
            int(r["w"][1:]): r["n"]
            for r in words.groupBy("w")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        bucket_tot = [0] * 16
        for rank, n in counts.items():
            bucket_tot[min((rank - 1) // 100, 15)] += n
        assert all(
            bucket_tot[i] >= bucket_tot[i + 1]
            for i in range(len(bucket_tot) - 1)
        )

    def test_hill_rich_is_non_degenerate(self, spark):
        row = QUERIES["llm_hill_tail_rich"](spark, SF_DIR).collect()[0]
        assert row["k"] == 200
        assert row["c_k"] is not None and row["c_k"] >= 1
        assert row["sum_micro"] > 0
        assert row["alpha"] is not None and row["alpha"] > 0

    def test_source_hh_rich_exact_recompute(self, spark):
        """Pure recompute: exact per-source token counts + ceil
        threshold must reproduce the operator's rows exactly (the MG
        propose step may only affect performance, never the set)."""
        import math
        from collections import Counter

        from crowdsorsa_etl_spark.queries.round19_pack import (
            _HH_RICH_SHARE,
            _rich_words_spark,
        )
        from crowdsorsa_etl_spark.queries._shared import _t

        docs = _t(spark, SF_DIR, "documents")
        toks = docs.select(
            "source", F.explode(_rich_words_spark()).alias("w")
        ).collect()
        per_src: Counter = Counter()
        totals: Counter = Counter()
        for r in toks:
            per_src[(r["source"], r["w"])] += 1
            totals[r["source"]] += 1
        want = {
            (g, t, c)
            for (g, t), c in per_src.items()
            if c >= max(int(math.ceil(_HH_RICH_SHARE * totals[g])), 1)
        }
        got = {
            (r["g"], r["token"], r["cnt"])
            for r in QUERIES["llm_source_hh_rich"](spark, SF_DIR).collect()
        }
        assert got == want
        assert len(got) > 0

    def test_bpe_rich_learns_eight_ordered_merges(self, spark):
        rows = (
            QUERIES["llm_bpe_merges_rich"](spark, SF_DIR)
            .orderBy("merge_rank")
            .collect()
        )
        assert [r["merge_rank"] for r in rows] == list(range(1, 9))
        assert all(r["total"] > 0 for r in rows)
        assert len({r["pair"] for r in rows}) == 8


# ---------------------------------------------------------------------------
# with_global_cumsum_multi — the multi-weight two-phase cumsum that
# removes q121's single-partition grid window (VERDICT r15 next-#4).
# ---------------------------------------------------------------------------


class TestGlobalCumsumMulti:
    def test_matches_window_cumsum(self, spark):
        from pyspark.sql import Window

        from crowdsorsa_etl_spark.operators.global_rank import (
            with_global_cumsum_multi,
        )

        df = spark.range(0, 500).select(
            (F.col("id") * 37 % 499).alias("v"),
            (F.col("id") % 7).alias("a"),
            F.when(F.col("id") % 11 == 0, None)
            .otherwise(F.col("id") % 5)
            .alias("b"),
        )
        got = {
            r["v"]: (r["ca"], r["cb"])
            for r in with_global_cumsum_multi(
                df, [F.col("v")], ["a", "b"], cum_cols=["ca", "cb"]
            ).collect()
        }
        w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
        want = {
            r["v"]: (r["ca"], r["cb"])
            for r in df.select(
                "v",
                F.sum(F.coalesce("a", F.lit(0))).over(w).alias("ca"),
                F.sum(F.coalesce("b", F.lit(0))).over(w).alias("cb"),
            ).collect()
        }
        assert got == want

    def test_q121_has_no_partitionless_window(self, spark):
        """The rewired q121 must carry NO unpartitioned window — the
        grid cumsum runs through the two-phase range-sort machinery."""
        df = QUERIES["q121_ks_drift"](spark, SF_DIR)
        plan = df._jdf.queryExecution().optimizedPlan()

        def walk(node):
            name = node.getClass().getSimpleName()
            if name == "Window" and node.partitionSpec().isEmpty():
                yield node
            for i in range(node.children().size()):
                yield from walk(node.children().apply(i))

        assert list(walk(plan)) == []

    def test_q121_hash_contract_unchanged(self, spark):
        """The rewrite must preserve the exact output (the oracle pins
        this too; this is the fast in-repo version)."""
        import duckdb

        from crowdsorsa_etl_spark.queries import ORACLES

        con = duckdb.connect()
        for t in ("documents",):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"'{SF_DIR}/{t}.parquet'"
            )
        want = con.execute(ORACLES["q121_ks_drift"]).fetchall()
        got = [
            tuple(r)
            for r in QUERIES["q121_ks_drift"](spark, SF_DIR).collect()
        ]
        assert sorted(got) == sorted(want)


# ---------------------------------------------------------------------------
# start_cusum_stream — streaming CUSUM changepoint monitor (VERDICT r15
# next-#6): carried per-day BIGINT counts, epoch-versioned (additive
# fold ⇒ replay must not double-count), per-epoch summary re-derives
# the EXACT batch q122 arithmetic.
# ---------------------------------------------------------------------------


class TestCusumStream:
    def _stage_event_files(self, spark, tmp_path, n_batches=3):
        from crowdsorsa_etl_spark.queries._shared import _t

        ev = _t(spark, SF_DIR, "events").select("event_id", "ts")
        src = str(tmp_path / "events")
        os.makedirs(src)
        for i in range(n_batches):
            staging = str(tmp_path / f"_e{i}")
            ev.filter(F.col("event_id") % n_batches == i).coalesce(
                1
            ).write.mode("overwrite").parquet(staging)
            part = [
                f for f in os.listdir(staging) if f.endswith(".parquet")
            ][0]
            os.rename(
                os.path.join(staging, part),
                os.path.join(src, f"b{i}.parquet"),
            )
        return src

    def test_stream_fold_equals_batch_q122(self, spark, tmp_path):
        import shutil

        from crowdsorsa_etl_spark.streaming.pipeline import (
            start_cusum_stream,
        )

        src = self._stage_event_files(spark, tmp_path)
        store = str(tmp_path / "store")

        def run():
            q = start_cusum_stream(
                spark.readStream.schema("event_id long, ts timestamp")
                .option("maxFilesPerTrigger", 1)
                .parquet(src),
                store,
                checkpoint_dir=str(tmp_path / "ckpt"),
                ts_col="ts",
            )
            try:
                q.processAllAvailable()
            finally:
                q.stop()

        def final():
            epochs = [
                int(d.split("=", 1)[1])
                for d in os.listdir(store)
                if d.startswith("epoch=")
            ]
            last = os.path.join(store, f"epoch={max(epochs)}")
            days = {
                r["day"]: r["n_d"]
                for r in spark.read.schema("day date, n_d bigint")
                .parquet(os.path.join(last, "days"))
                .collect()
            }
            summary = (
                spark.read.parquet(os.path.join(last, "summary")).collect()
            )[0]
            return days, summary

        run()
        days, summary = final()
        batch = QUERIES["q122_cusum_days"](spark, SF_DIR).collect()
        want_days = {r["day"]: r["n_d"] for r in batch}
        assert days == want_days
        peak = [r for r in batch if r["is_peak"]]
        assert len(peak) == 1
        assert summary["peak_day"] == peak[0]["day"]
        assert summary["peak_abs"] == abs(peak[0]["cusum_num"])
        assert summary["n_days"] == len(want_days)
        assert summary["n_events"] == sum(want_days.values())
        # replay from a lost checkpoint: additive day counts would
        # double-count without the epoch guard — state must be identical
        shutil.rmtree(str(tmp_path / "ckpt"))
        run()
        days2, summary2 = final()
        assert days2 == days
        assert summary2 == summary
