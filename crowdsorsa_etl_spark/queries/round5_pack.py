"""Round 5: TPC-H Q21 decorrelation shape.

Split from the original monolithic queries.py in round 5. Registration
ORDER is load-bearing (the driver's correctness window samples the first 50
registrations), so modules are imported in the original file order by
queries/__init__.py, which also asserts the canonical order afterwards.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from crowdsorsa_etl_spark.queries._shared import (
    _t,
    register,
)

# ===========================================================================
# Round 5: TPC-H Q21 decorrelation shape + portable-LSH oracle tier
# ===========================================================================


@register(
    "q88_waiting_orders",
    """
    WITH f_orders AS (
      SELECT o_orderkey, o_orderdate FROM orders WHERE o_orderstatus = 'F'
    ),
    late AS (
      SELECT DISTINCT l_orderkey, l_suppkey
      FROM lineitem JOIN f_orders ON l_orderkey = o_orderkey
      WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
    )
    SELECT s_name, count(*) AS numwait
    FROM late l1
    JOIN supplier ON l1.l_suppkey = s_suppkey
    WHERE EXISTS (
            SELECT 1 FROM lineitem l2
            WHERE l2.l_orderkey = l1.l_orderkey
              AND l2.l_suppkey <> l1.l_suppkey
          )
      AND NOT EXISTS (
            SELECT 1 FROM late l3
            WHERE l3.l_orderkey = l1.l_orderkey
              AND l3.l_suppkey <> l1.l_suppkey
          )
    GROUP BY s_name
    """,
)
def q88_waiting_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 analogue — the hardest classic decorrelation shape: a
    correlated EXISTS (another supplier touched the order) AND a correlated
    NOT EXISTS (no OTHER supplier was late) against the same fact table,
    both with an inequality correlation (``l_suppkey <>``), composed as one
    semi join + one anti join (never a cartesian product).

    The fixture lacks receipt/commit dates (TPC-H Q21's lateness test), so
    "late" is l_shipdate > o_orderdate + 60 days on 'F'-status orders —
    same plan shape, different constant. ``late`` is computed once and
    reused by both the driving side and the NOT EXISTS branch (the
    reference pattern recomputes it per subquery).

    At 100 TB: late/all_pairs shuffle on l_orderkey for both the semi and
    the anti join — one co-partitioned exchange each, no row explosion
    (distinct pairs before the joins bound both sides by |orders|·|supps
    per order|).
    """
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")

    f_orders = orders.filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    late = (
        li.join(f_orders, li.l_orderkey == f_orders.o_orderkey)
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")
        )
        .select("l_orderkey", "l_suppkey")
        .distinct()
        # materialize ONCE (guide §3.3): the driving side and the NOT
        # EXISTS branch both consume `late`, and the optimizer pushes the
        # semi join below the driving side's distinct — the two dedup
        # exchanges are then non-identical, so AQE stage reuse cannot
        # serve them and the lineitem⋈orders join ran twice (r16 profile:
        # two same-sized stages). Bounded by distinct (order, supplier)
        # pairs; at 100 TB recomputing it is a full extra fact-table join.
        .localCheckpoint()
    )
    all_pairs = li.select("l_orderkey", "l_suppkey").distinct()

    l1 = late.alias("l1")
    # EXISTS: some other supplier in the same order → left-semi
    with_other = l1.join(
        all_pairs.alias("l2"),
        (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
        "left_semi",
    )
    # NOT EXISTS: no OTHER late supplier in the same order → left-anti
    only_late = with_other.alias("w").join(
        late.alias("l3"),
        (F.col("w.l_orderkey") == F.col("l3.l_orderkey"))
        & (F.col("w.l_suppkey") != F.col("l3.l_suppkey")),
        "left_anti",
    )
    return (
        only_late.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
