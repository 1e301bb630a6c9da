"""SCD2 builder: run collapsing, null-safe change detection, tie-breaks,
validity-interval chaining, and the single-Exchange plan contract."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from crowdsorsa_etl_spark.operators.scd import scd2_build


def _ts(s):
    return datetime.fromisoformat(s)


LOG = [
    # key 1: A A B B A → versions A, B, A (runs collapse)
    (1, _ts("2024-01-01T00:00:00"), "A", 1),
    (1, _ts("2024-01-02T00:00:00"), "A", 2),
    (1, _ts("2024-01-03T00:00:00"), "B", 3),
    (1, _ts("2024-01-04T00:00:00"), "B", 4),
    (1, _ts("2024-01-05T00:00:00"), "A", 5),
    # key 2: NULL → NULL → X → NULL (null-safe: 3 versions)
    (2, _ts("2024-01-01T00:00:00"), None, 6),
    (2, _ts("2024-01-02T00:00:00"), None, 7),
    (2, _ts("2024-01-03T00:00:00"), "X", 8),
    (2, _ts("2024-01-04T00:00:00"), None, 9),
    # key 3: two changes at the SAME timestamp — event_id breaks the tie
    (3, _ts("2024-01-01T00:00:00"), "P", 11),
    (3, _ts("2024-01-01T00:00:00"), "Q", 10),
]


def _build(spark):
    df = spark.createDataFrame(
        LOG, "user_id long, ts timestamp, status string, event_id long"
    )
    return scd2_build(
        df,
        key_cols=["user_id"],
        ts_col="ts",
        tracked_cols=["status"],
        tie_break_cols=["event_id"],
    )


class TestScd2Build:
    def test_runs_collapse_and_intervals_chain(self, spark):
        rows = sorted(
            ((r.user_id, r.version, r.status, r.valid_from, r.valid_to,
              r.is_current) for r in _build(spark).collect())
        )
        k1 = [r for r in rows if r[0] == 1]
        assert [(r[1], r[2]) for r in k1] == [(1, "A"), (2, "B"), (3, "A")]
        # intervals chain: each valid_to is the next valid_from; only the
        # last version is current/open
        for a, b in zip(k1, k1[1:]):
            assert a[4] == b[3] and a[5] is False
        assert k1[-1][4] is None and k1[-1][5] is True

    def test_null_safe_change_detection(self, spark):
        k2 = sorted(
            (r.version, r.status)
            for r in _build(spark).collect()
            if r.user_id == 2
        )
        # NULL→NULL is not a change; NULL→X and X→NULL are
        assert k2 == [(1, None), (2, "X"), (3, None)]

    def test_same_timestamp_tie_break(self, spark):
        k3 = sorted(
            (r.version, r.status)
            for r in _build(spark).collect()
            if r.user_id == 3
        )
        # event_id 10 (Q) orders before 11 (P) at the shared timestamp
        assert k3 == [(1, "Q"), (2, "P")]

    def test_asof_lookup_exactly_one_version_per_event(self, spark):
        """Validity intervals PARTITION each key's timeline: a point lookup
        at any covered instant matches exactly one version (the invariant
        q98_scd2_asof_lookup relies on)."""
        from crowdsorsa_etl_spark.queries import QUERIES

        out = QUERIES["q98_scd2_asof_lookup"](spark, "/root/testdata/sf0.001")
        assert (
            out.groupBy("event_id").count().filter(F.col("count") > 1).count()
            == 0
        )
        assert out.count() > 0
        # the dimension excludes purchases, so no status is 'purchase'
        assert out.filter(F.col("status_at_purchase") == "purchase").count() == 0

    def test_single_exchange_plan(self, spark):
        out = _build(spark)
        plan = out._sc._jvm.PythonSQLUtils.explainString(
            out._jdf.queryExecution(), "formatted"
        )
        # all three windows share one (key × order) partitioning
        assert plan.count(") Exchange") == 1
