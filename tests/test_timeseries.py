"""Bounded-span EWMA: pandas ewm parity inside the span, weight math,
ordering determinism, and guards."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from crowdsorsa_etl_spark.operators.timeseries import ewma


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, value double"
    )


def _ts(i):
    return (pd.Timestamp("2024-01-01") + pd.Timedelta(minutes=i)).to_pydatetime()


class TestEwma:
    def test_matches_pandas_ewm_within_span(self, spark):
        # first `span` rows of a single key: truncated == untruncated,
        # so pandas ewm(adjust=True) is the exact reference
        vals = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0]
        df = _events(
            spark, [(1, i, _ts(i), v) for i, v in enumerate(vals)]
        )
        got = (
            ewma(df, "value", alpha=0.5, span=10)
            .orderBy("event_id")
            .select("ewma")
            .collect()
        )
        want = pd.Series(vals).ewm(alpha=0.5, adjust=True).mean()
        for g, w in zip(got, want):
            assert g["ewma"] == pytest.approx(round(w, 6), abs=1e-6)

    def test_span_truncates_history(self, spark):
        # constant tail after a spike: with span=2 the spike must leave
        # the window after 2 rows
        vals = [100.0, 0.0, 0.0, 0.0]
        df = _events(spark, [(1, i, _ts(i), v) for i, v in enumerate(vals)])
        got = (
            ewma(df, "value", alpha=0.5, span=2)
            .orderBy("event_id")
            .select("ewma")
            .collect()
        )
        # row 2: window = [0, 0] -> 0; spike fully gone
        assert got[2]["ewma"] == 0.0
        assert got[3]["ewma"] == 0.0
        # row 1: (0*1 + 100*0.5)/(1.5)
        assert got[1]["ewma"] == pytest.approx(100 * 0.5 / 1.5, abs=1e-6)

    def test_keys_are_independent(self, spark):
        df = _events(
            spark,
            [(1, 0, _ts(0), 10.0), (1, 1, _ts(1), 20.0), (2, 0, _ts(0), 99.0)],
        )
        got = {
            (r["user_id"], r["event_id"]): r["ewma"]
            for r in ewma(df, "value", alpha=0.5, span=5).collect()
        }
        assert got[(2, 0)] == 99.0
        assert got[(1, 1)] == pytest.approx((20 + 10 * 0.5) / 1.5, abs=1e-6)

    def test_tie_break_makes_order_total(self, spark):
        # same ts for both events: event_id orders them
        df = _events(
            spark, [(1, 2, _ts(0), 7.0), (1, 1, _ts(0), 1.0)]
        )
        got = (
            ewma(df, "value", alpha=0.5, span=5)
            .orderBy("event_id")
            .select("ewma")
            .collect()
        )
        assert got[0]["ewma"] == 1.0
        assert got[1]["ewma"] == pytest.approx((7 + 1 * 0.5) / 1.5, abs=1e-6)

    def test_alpha_guard(self, spark):
        df = _events(spark, [(1, 0, _ts(0), 1.0)])
        with pytest.raises(ValueError, match="alpha"):
            ewma(df, "value", alpha=1.0)
        with pytest.raises(ValueError, match="span"):
            ewma(df, "value", span=0)

    def test_single_window_exchange(self, spark):
        df = _events(spark, [(1, 0, _ts(0), 1.0)])
        plan = ewma(df, "value")._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") <= 1
