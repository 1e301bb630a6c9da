"""Bucketed tables give shuffle-free co-located joins — the pre-shuffled
layout that turns every later join/agg on the bucket key into a zero-exchange
stage (the 100 TB story: pay the shuffle once at write time)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crowdsorsa_etl_spark.sinks.writers import write_bucketed
from crowdsorsa_etl_spark.sources.parquet import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    orders = load_table(spark, "orders", SF_DIR)
    lineitem = load_table(spark, "lineitem", SF_DIR)
    write_bucketed(
        orders, "bkt_orders", bucket_by=["o_orderkey"], num_buckets=8,
        sort_by=["o_orderkey"],
    )
    write_bucketed(
        lineitem, "bkt_lineitem", bucket_by=["l_orderkey"], num_buckets=8,
        sort_by=["l_orderkey"],
    )
    yield "bkt_orders", "bkt_lineitem"
    spark.sql("DROP TABLE IF EXISTS bkt_orders")
    spark.sql("DROP TABLE IF EXISTS bkt_lineitem")


@pytest.fixture()
def no_broadcast(spark):
    """Force the non-broadcast join path so the bucketed layout is what
    the planner exercises (at real scale both sides are too big to
    broadcast; at sf0.001 AQE would broadcast and skip bucketing)."""
    keys = [
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
    ]
    saved = {k: spark.conf.get(k, None) for k in keys}
    for k in keys:
        spark.conf.set(k, "-1")
    yield
    for k, v in saved.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


class TestBucketJoin:
    def test_join_has_no_exchange(self, spark, bucketed_tables, no_broadcast):
        ot, lt = bucketed_tables
        joined = (
            spark.table(ot)
            .join(
                spark.table(lt),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .groupBy("o_orderpriority")
            .agg(F.sum("l_quantity").alias("qty"))
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # matching bucket count + key on both sides: the join itself needs
        # NO shuffle; the only exchange allowed is the tiny post-join agg
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        join_part = plan[plan.index("Join"):]
        assert "Exchange" not in join_part, join_part
        assert "Bucketed: true" in plan, plan

    def test_bucketed_join_matches_plain_join(self, spark, bucketed_tables):
        ot, lt = bucketed_tables
        got = (
            spark.table(ot)
            .join(spark.table(lt), F.col("o_orderkey") == F.col("l_orderkey"))
            .count()
        )
        want = (
            load_table(spark, "orders", SF_DIR)
            .join(
                load_table(spark, "lineitem", SF_DIR),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .count()
        )
        assert got == want > 0

    def test_groupby_on_bucket_key_no_exchange(
        self, spark, bucketed_tables, no_broadcast
    ):
        _, lt = bucketed_tables
        agg = spark.table(lt).groupBy("l_orderkey").agg(
            F.sum("l_quantity").alias("q")
        )
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
