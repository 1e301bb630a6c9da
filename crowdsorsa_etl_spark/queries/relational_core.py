"""Relational core (q01-q20): aggregations, joins, windows, set ops.

Split from the original monolithic queries.py in round 5. Registration
ORDER is load-bearing (the driver's correctness window samples the first 50
registrations), so modules are imported in the original file order by
queries/__init__.py, which also asserts the canonical order afterwards.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from crowdsorsa_etl_spark.operators.asof import asof_join  # noqa: F401
from crowdsorsa_etl_spark.operators.topk import sessionize, topk_per_group  # noqa: F401
from crowdsorsa_etl_spark.queries._shared import (
    _t,
    register,
)


# ===========================================================================
# Relational core (SURVEY §2.2: aggregations, joins, windows, set ops, ...)
# ===========================================================================


@register(
    "q01_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                 AS sum_qty,
           round(sum(l_extendedprice), 2)                            AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)         AS sum_disc_price,
           round(sum(l_quantity), 2) / count(*)                      AS avg_qty,
           round(sum(l_extendedprice), 2) / count(*)                 AS avg_price,
           round(sum(l_discount), 4) / count(*)                      AS avg_disc,
           count(*)                                                  AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: partial+final hash agg, filter pushed to the scan."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02 00:00:00")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            # avg as round(sum)/count: the sum of 2-dp money values is an
            # exactly-representable 2-dp rational, so rounding it is ulp-safe
            # in both engines; a rounded avg() can straddle a .xx5 boundary
            (F.round(F.sum("l_quantity"), 2) / F.count(F.lit(1))).alias("avg_qty"),
            (F.round(F.sum("l_extendedprice"), 2) / F.count(F.lit(1))).alias(
                "avg_price"
            ),
            (F.round(F.sum("l_discount"), 4) / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q02_revenue_filter",
    """
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
           count(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.04 AND 0.06
      AND l_quantity < 24
    """,
)
def q02_revenue_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: conjunctive predicates → all pushed to parquet scan."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01 00:00:00")
            & (F.col("l_shipdate") < "1997-01-01 00:00:00")
            & (F.col("l_discount").between(0.04, 0.06))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@register(
    "q03_star_join",
    """
    SELECT r_name, n_name,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS total_revenue
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
)
def q03_star_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema join: nation/region broadcast (dims), customer⋈orders on
    the fact key; the reference's only join shape (S10) generalized."""
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    dim = customer.join(
        F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
    ).join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    return (
        orders.join(dim, orders.o_custkey == dim.c_custkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_revenue"),
        )
    )


@register(
    "q04_bigjoin_priority",
    """
    SELECT o_orderpriority,
           CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_orders,
           round(sum(l_quantity), 2) AS total_qty,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS charged
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def q04_bigjoin_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact⋈fact equi-join — sort-merge/shuffled-hash territory, AQE picks."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_orderkey").alias("n_orders"),
            F.round(F.sum("l_quantity"), 2).alias("total_qty"),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("charged"),
        )
    )


@register(
    "q05_semi_join",
    """
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
    """,
)
def q05_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name", "c_mktsegment")


@register(
    "q06_anti_join",
    """
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def q06_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@register(
    "q07_topk_per_group",
    """
    SELECT o_custkey, o_orderkey, o_totalprice, rank
    FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                 CAST(row_number() OVER (
                      PARTITION BY o_custkey
                      ORDER BY o_totalprice DESC, o_orderkey ASC) AS INT) AS rank
          FROM orders)
    WHERE rank <= 3
    """,
)
def q07_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer; Spark's WindowGroupLimit prunes below the
    shuffle so only k rows per group per task move."""
    orders = _t(spark, sf_dir, "orders")
    return topk_per_group(
        orders, ["o_custkey"], "o_totalprice", 3, tiebreak="o_orderkey"
    ).select("o_custkey", "o_orderkey", "o_totalprice", "rank")


@register(
    "q08_window_nav",
    """
    SELECT o_custkey, o_orderkey,
           CAST(row_number() OVER w AS INT) AS seq,
           lag(o_totalprice) OVER w  AS prev_price,
           strftime(lead(o_orderdate) OVER w, '%Y-%m-%d') AS next_date,
           round(sum(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def q08_window_nav(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Navigation + frame window functions (lag/lead/row_number/running)."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).alias("seq"),
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.date_format(F.lead("o_orderdate").over(w), "yyyy-MM-dd").alias("next_date"),
        F.round(
            F.sum("o_totalprice").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
            2,
        ).alias("running_spend"),
    )


@register(
    "q09_rollup",
    """
    SELECT l_returnflag, l_linestatus,
           count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q09_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


@register(
    "q10_distinct_agg",
    """
    SELECT l_returnflag,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
           count(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q10_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "q11_set_ops",
    """
    (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
     INTERSECT
     SELECT o_custkey AS c_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
    UNION
    (SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
     EXCEPT
     SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 100000)
    """,
)
def q11_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    building = customer.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("c_custkey")
    )
    auto = customer.filter(F.col("c_mktsegment") == "AUTOMOBILE").select("c_custkey")
    big = orders.filter(F.col("o_totalprice") > 100000).select(
        F.col("o_custkey").alias("c_custkey")
    )
    return building.intersect(urgent).union(auto.subtract(big)).distinct()


@register(
    "q12_scalar_funcs",
    """
    SELECT o_orderkey,
           CASE WHEN o_orderstatus = 'P' THEN 'PENDING' ELSE o_orderstatus END AS status_recode,
           'order-' || CAST(o_orderkey AS VARCHAR) AS tag,
           printf('http://example.invalid/%s/%d', o_orderpriority, o_orderkey) AS uri,
           lower(o_orderpriority) AS priority_lower,
           regexp_replace(o_orderpriority, '^1-', 'P1-') AS priority_fixed,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date,
           CAST(year(o_orderdate) AS INT) AS order_year,
           CAST(month(o_orderdate) AS INT) AS order_month,
           CAST(ceil(o_totalprice / 1000) AS BIGINT) AS price_bucket,
           round(o_totalprice, 1) AS price_rounded,
           CASE WHEN o_orderstatus = 'F' THEN NULL
                ELSE 'Controlled: ' || strftime(o_orderdate, '%Y-%m-%d') END AS notes
    FROM orders
    """,
)
def q12_scalar_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's scalar surface (S6, S9, S11-S12, S17-S18, S21-S22,
    S26-S27) exercised as one projection — stays in whole-stage codegen."""
    orders = _t(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.when(F.col("o_orderstatus") == "P", "PENDING")
        .otherwise(F.col("o_orderstatus"))
        .alias("status_recode"),
        F.concat(F.lit("order-"), F.col("o_orderkey").cast("string")).alias("tag"),
        F.format_string(
            "http://example.invalid/%s/%d", F.col("o_orderpriority"), F.col("o_orderkey")
        ).alias("uri"),
        F.lower("o_orderpriority").alias("priority_lower"),
        F.regexp_replace("o_orderpriority", "^1-", "P1-").alias("priority_fixed"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.ceil(F.col("o_totalprice") / 1000).alias("price_bucket"),
        F.round(F.col("o_totalprice"), 1).alias("price_rounded"),
        F.when(
            F.col("o_orderstatus") != "F",
            F.concat(
                F.lit("Controlled: "), F.date_format("o_orderdate", "yyyy-MM-dd")
            ),
        ).alias("notes"),
    )


@register(
    "q13_asof_join",
    """
    SELECT event_id, user_id,
           o_orderkey AS asof_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS asof_orderdate
    FROM (SELECT e.event_id, e.user_id, o.o_orderkey, o.o_orderdate,
                 row_number() OVER (PARTITION BY e.event_id
                                    ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
          FROM events e
          LEFT JOIN orders o ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts)
    WHERE rn = 1
    """,
)
def q13_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join via the union-merge operator (see operators/asof.py) —
    ONE shuffle, no candidate blowup, vs the oracle's quadratic LEFT JOIN."""
    events = _t(spark, sf_dir, "events")
    orders = _t(spark, sf_dir, "orders").withColumnRenamed("o_custkey", "user_id")
    joined = asof_join(
        events,
        orders,
        on="user_id",
        left_time="ts",
        right_time="o_orderdate",
        right_payload=["o_orderkey", "o_orderdate"],
        tiebreak="o_orderkey",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("o_orderkey").alias("asof_orderkey"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("asof_orderdate"),
    )


@register(
    "q14_json_extract",
    """
    SELECT event_type,
           count(*) AS n,
           round(avg(CAST(json_extract_string(props, '$.k') AS INT)), 2) AS avg_k,
           CAST(max(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS max_k
    FROM events
    GROUP BY event_type
    """,
)
def q14_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props column → json path extraction (S15/S28 family)."""
    events = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg(k), 2).alias("avg_k"),
        F.max(k).alias("max_k"),
    )


@register(
    "q15_pivot",
    """
    SELECT l_returnflag,
           round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS qty_open,
           round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS qty_filled
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q15_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum("l_quantity"), 2))
        .withColumnRenamed("O", "qty_open")
        .withColumnRenamed("F", "qty_filled")
    )


@register(
    "q16_explode_tokens",
    """
    SELECT token, count(*) AS n,
           CAST(count(DISTINCT p_brand) AS BIGINT) AS n_brands
    FROM (SELECT unnest(string_split(p_type, ' ')) AS token, p_brand FROM part)
    GROUP BY token
    """,
)
def q16_explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array build + explode (UDTF surface, S23 analogue)."""
    part = _t(spark, sf_dir, "part")
    return (
        part.select(
            F.explode(F.split("p_type", " ", -1)).alias("token"), "p_brand"
        )
        .groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("p_brand").alias("n_brands"),
        )
    )


@register(
    "q17_grouping_sets",
    """
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n, round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def q17_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n, round(sum(o_totalprice), 2) AS total
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@register(
    "q18_sessionize",
    """
    WITH gaps AS (
      SELECT user_id,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    )
    SELECT user_id,
           CAST(sum(new_session) AS BIGINT) AS n_sessions,
           count(*) AS n_events
    FROM gaps GROUP BY user_id
    """,
)
def q18_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (gap > 30 min) — batch analogue of session_window."""
    events = _t(spark, sf_dir, "events")
    sess = sessionize(events, user_col="user_id", ts_col="ts", gap_minutes=30)
    return sess.groupBy("user_id").agg(
        F.max("session_seq").cast("bigint").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "q19_tumbling_window",
    """
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           count(*) AS n,
           round(sum(value), 2) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q19_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation — identical code runs under
    Structured Streaming with a watermark (see streaming/)."""
    events = _t(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


@register(
    "q20_range_join",
    """
    SELECT tier, count(*) AS n, round(sum(l_extendedprice), 2) AS total_price
    FROM lineitem
    JOIN (VALUES (0.0, 10.0, 'small'), (10.0, 25.0, 'mid'), (25.0, 100.0, 'big'))
         AS tiers(lo, hi, tier)
      ON l_quantity >= lo AND l_quantity < hi
    GROUP BY tier
    """,
)
def q20_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (theta/range) join against a broadcast tier dim →
    BroadcastNestedLoopJoin; the scale path for big-big range joins is
    bucketize-then-equi-join (see operators/asof.py for the as-of variant)."""
    li = _t(spark, sf_dir, "lineitem")
    tiers = spark.createDataFrame(
        [(0.0, 10.0, "small"), (10.0, 25.0, "mid"), (25.0, 100.0, "big")],
        "lo double, hi double, tier string",
    )
    return (
        li.join(
            F.broadcast(tiers),
            (F.col("l_quantity") >= F.col("lo")) & (F.col("l_quantity") < F.col("hi")),
        )
        .groupBy("tier")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
        )
    )


