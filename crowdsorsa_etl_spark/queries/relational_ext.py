"""Relational core, batches 2-3: percentiles, frames, scalar surface, HOFs.

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
# Relational core, batch 2 (percentiles, frames, string/math surface,
# union-by-name, correlated aggregates, sliding windows)
# ===========================================================================


@register(
    "q21_percentiles",
    """
    SELECT l_returnflag,
           round(CAST(quantile_cont(l_extendedprice, 0.25) AS DOUBLE), 4) AS p25,
           round(CAST(quantile_cont(l_extendedprice, 0.50) AS DOUBLE), 4) AS p50,
           round(CAST(quantile_cont(l_extendedprice, 0.75) AS DOUBLE), 4) AS p75,
           round(max(l_extendedprice), 4) AS pmax
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q21_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (the approx_percentile variant exists
    for 100 TB use; exact is the oracle-checkable one)."""
    li = _t(spark, sf_dir, "lineitem")
    # one percentile aggregate, not three (r16, guide §1.2 per-task work):
    # each scalar percentile() buffers and sorts the full per-group value
    # list independently; the array form does it once for all three
    # quantiles. Same interpolation, same values.
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.expr(
                "percentile(l_extendedprice, array(0.25D, 0.50D, 0.75D))"
            ).alias("_p"),
            F.round(F.max("l_extendedprice"), 4).alias("pmax"),
        )
        .select(
            "l_returnflag",
            F.round(F.col("_p")[0], 4).alias("p25"),
            F.round(F.col("_p")[1], 4).alias("p50"),
            F.round(F.col("_p")[2], 4).alias("p75"),
            "pmax",
        )
    )


@register(
    "q22_cross_join",
    """
    SELECT r_name, o_orderstatus, count(*) AS n
    FROM region
    CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders)
    GROUP BY r_name, o_orderstatus
    """,
)
def q22_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = _t(spark, sf_dir, "region")
    status = _t(spark, sf_dir, "orders").select("o_orderstatus").distinct()
    return region.crossJoin(status).groupBy("r_name", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n")
    )


@register(
    "q23_union_by_name",
    """
    SELECT entity_id, kind, label, score FROM (
      (SELECT CAST(c_custkey AS VARCHAR) AS entity_id, 'customer' AS kind,
              c_mktsegment AS label, round(c_acctbal, 2) AS score
       FROM customer WHERE c_acctbal > 9000)
      UNION ALL BY NAME
      (SELECT CAST(s_suppkey AS VARCHAR) AS entity_id, 'supplier' AS kind,
              CAST(NULL AS VARCHAR) AS label, round(s_acctbal, 2) AS score
       FROM supplier WHERE s_acctbal > 9000)
    )
    """,
)
def q23_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolving union (the engine's replacement for the reference's
    two separate season scripts — SURVEY §2.2 set ops)."""
    customer = _t(spark, sf_dir, "customer")
    supplier = _t(spark, sf_dir, "supplier")
    c = customer.filter(F.col("c_acctbal") > 9000).select(
        F.col("c_custkey").cast("string").alias("entity_id"),
        F.lit("customer").alias("kind"),
        F.col("c_mktsegment").alias("label"),
        F.round("c_acctbal", 2).alias("score"),
    )
    s = supplier.filter(F.col("s_acctbal") > 9000).select(
        F.col("s_suppkey").cast("string").alias("entity_id"),
        F.lit("supplier").alias("kind"),
        F.round("s_acctbal", 2).alias("score"),
    )
    return c.unionByName(s, allowMissingColumns=True)


@register(
    "q24_correlated_agg",
    """
    SELECT c_custkey, c_name, round(c_acctbal, 2) AS acctbal, nation_avg
    FROM customer
    JOIN (SELECT c_nationkey AS nk,
                 round(sum(c_acctbal), 2) / count(*) AS nation_avg
          FROM customer GROUP BY c_nationkey) ON c_nationkey = nk
    WHERE c_acctbal > nation_avg * 1.5
    """,
)
def q24_correlated_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers 50% above their nation's average balance — the decorrelated
    join form (what Catalyst rewrites a correlated subquery into)."""
    customer = _t(spark, sf_dir, "customer")
    # round(sum)/count, not round(avg): see q01 note on .xx5 boundaries
    nation_avg = customer.groupBy(F.col("c_nationkey").alias("nk")).agg(
        (F.round(F.sum("c_acctbal"), 2) / F.count(F.lit(1))).alias("nation_avg")
    )
    return (
        customer.join(nation_avg, customer.c_nationkey == nation_avg.nk)
        .filter(F.col("c_acctbal") > F.col("nation_avg") * 1.5)
        .select(
            "c_custkey",
            "c_name",
            F.round("c_acctbal", 2).alias("acctbal"),
            "nation_avg",
        )
    )


@register(
    "q25_string_funcs",
    """
    SELECT p_partkey,
           substr(p_name, 1, 10) AS name10,
           lpad(CAST(p_partkey AS VARCHAR), 10, '0') AS padded_key,
           reverse(p_brand) AS brand_rev,
           CAST(strpos(p_type, 'BRUSHED') AS INT) AS brushed_at,
           replace(p_type, ' ', '_') AS type_snake,
           upper(left(p_name, 1)) || lower(right(p_name, 2)) AS name_mix,
           repeat('*', p_size % 5) AS stars,
           CAST(length(p_name) AS INT) AS name_len
    FROM part
    """,
)
def q25_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.substring("p_name", 1, 10).alias("name10"),
        F.lpad(F.col("p_partkey").cast("string"), 10, "0").alias("padded_key"),
        F.reverse("p_brand").alias("brand_rev"),
        F.instr("p_type", "BRUSHED").alias("brushed_at"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.concat(
            F.upper(F.left(F.col("p_name"), F.lit(1))),
            F.lower(F.right(F.col("p_name"), F.lit(2))),
        ).alias("name_mix"),
        F.repeat(F.lit("*"), (F.col("p_size") % 5)).alias("stars"),
        F.length("p_name").alias("name_len"),
    )


@register(
    "q26_math_funcs",
    """
    SELECT l_orderkey, l_linenumber,
           round(abs(l_extendedprice - l_quantity * 1000), 4) AS adiff,
           CAST(mod(CAST(l_quantity AS BIGINT), 7) AS BIGINT) AS qmod,
           round(power(l_discount + 1, 2), 8) AS dpow,
           round(sqrt(l_extendedprice), 8) AS esqrt,
           round(ln(l_extendedprice + 1), 8) AS eln,
           round(log10(l_extendedprice + 1), 8) AS elog10,
           CAST(sign(l_extendedprice - 30000) AS DOUBLE) AS esign,
           CAST(floor(l_tax * 100) AS BIGINT) AS taxf,
           CAST(ceil(l_tax * 100) AS BIGINT) AS taxc
    FROM lineitem
    WHERE l_orderkey < 1000
    """,
)
def q26_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 1000)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.abs(F.col("l_extendedprice") - F.col("l_quantity") * 1000), 4).alias("adiff"),
        (F.col("l_quantity").cast("bigint") % 7).cast("bigint").alias("qmod"),
        F.round(F.pow(F.col("l_discount") + 1, 2), 8).alias("dpow"),
        F.round(F.sqrt("l_extendedprice"), 8).alias("esqrt"),
        F.round(F.log(F.col("l_extendedprice") + 1), 8).alias("eln"),
        F.round(F.log10(F.col("l_extendedprice") + 1), 8).alias("elog10"),
        F.signum(F.col("l_extendedprice") - 30000).cast("double").alias("esign"),
        F.floor(F.col("l_tax") * 100).cast("bigint").alias("taxf"),
        F.ceil(F.col("l_tax") * 100).cast("bigint").alias("taxc"),
    )


@register(
    "q27_null_funcs",
    """
    SELECT o_orderkey,
           coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_or_open,
           ifnull(CASE WHEN o_totalprice > 200000 THEN o_orderpriority END,
                  'none') AS big_priority,
           greatest(round(o_totalprice, 0), 100000.0) AS at_least_100k,
           least(round(o_totalprice, 0), 100000.0) AS at_most_100k,
           (o_orderstatus = 'F') AS is_final,
           CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END AS price_null
    FROM orders
    """,
)
def q27_null_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.coalesce(
            F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN")
        ).alias("status_or_open"),
        F.ifnull(
            F.when(F.col("o_totalprice") > 200000, F.col("o_orderpriority")),
            F.lit("none"),
        ).alias("big_priority"),
        F.greatest(F.round("o_totalprice", 0), F.lit(100000.0)).alias("at_least_100k"),
        F.least(F.round("o_totalprice", 0), F.lit(100000.0)).alias("at_most_100k"),
        (F.col("o_orderstatus") == "F").alias("is_final"),
        F.when(F.col("o_totalprice").isNull(), 1).otherwise(0).alias("price_null"),
    )


@register(
    "q28_having",
    """
    SELECT l_suppkey, count(*) AS n, round(sum(l_quantity), 2) AS qty
    FROM lineitem
    GROUP BY l_suppkey
    HAVING sum(l_quantity) > 5000 AND count(*) > 100
    """,
)
def q28_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_suppkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("qty"),
            F.sum("l_quantity").alias("_raw_qty"),
        )
        .filter((F.col("_raw_qty") > 5000) & (F.col("n") > 100))
        .drop("_raw_qty")
    )


@register(
    "q29_top10_global",
    """
    SELECT o_orderkey, round(o_totalprice, 2) AS totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 10
    """,
)
def q29_top10_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Spark plans TakeOrderedAndProject — per-partition heap,
    no full sort; the pattern that matters at 100 TB."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
        .select("o_orderkey", F.round("o_totalprice", 2).alias("totalprice"))
    )


@register(
    "q30_range_frame",
    """
    SELECT o_custkey, o_orderkey,
           count(*) OVER (PARTITION BY o_custkey ORDER BY epoch_us(o_orderdate)
                          RANGE BETWEEN 7776000000000 PRECEDING AND CURRENT ROW)
             AS orders_trailing_90d
    FROM orders
    """,
)
def q30_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over event time: trailing-90-day order count per customer
    (90 d = 7_776_000_000_000 µs)."""
    orders = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        # parquet stores TIMESTAMP_NTZ; session TZ is pinned UTC so the cast
        # to TIMESTAMP is exact and unix_micros matches duckdb epoch_us
        .orderBy(F.unix_micros(F.col("o_orderdate").cast("timestamp")))
        .rangeBetween(-7_776_000_000_000, 0)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.count(F.lit(1)).over(w).alias("orders_trailing_90d"),
    )


@register(
    "q31_rank_distributions",
    """
    SELECT o_orderkey,
           CAST(ntile(4) OVER w AS INT) AS quartile,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cdist,
           CAST(rank() OVER w AS INT) AS rnk,
           CAST(dense_rank() OVER w AS INT) AS drnk
    FROM orders
    WINDOW w AS (ORDER BY o_totalprice ASC, o_orderkey ASC)
    """,
)
def q31_rank_distributions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global rank distributions WITHOUT a single-partition window: the
    naive ``Window.orderBy`` (no partitionBy) funnels the whole table
    through one task; operators/global_rank.py computes the same values
    via range-repartition + partition-count prefix sums. The sort key
    (o_totalprice, o_orderkey) is unique, which the operator requires."""
    from crowdsorsa_etl_spark.operators.global_rank import rank_distributions

    orders = _t(spark, sf_dir, "orders")
    return rank_distributions(
        orders.select("o_orderkey", "o_totalprice"),
        [F.col("o_totalprice").asc(), F.col("o_orderkey").asc()],
        ntile=4,
    ).select("o_orderkey", "quartile", "pct_rank", "cdist", "rnk", "drnk")


@register(
    "q32_first_last_value",
    """
    SELECT DISTINCT o_custkey,
           first_value(o_orderkey) OVER w AS first_order,
           last_value(o_orderkey)  OVER w AS last_order,
           CAST(count(*) OVER w AS BIGINT) AS n_orders
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def q32_first_last_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return orders.select(
        "o_custkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(w).alias("last_order"),
        F.count(F.lit(1)).over(w).alias("n_orders"),
    ).distinct()


@register(
    "q33_sliding_window",
    """
    SELECT strftime(time_bucket(INTERVAL '15 minutes', ts)
                      - k * INTERVAL '15 minutes', '%Y-%m-%d %H:%M:%S')
             AS window_start,
           event_type, count(*) AS n
    FROM events, range(0, 4) t(k)
    GROUP BY 1, 2
    """,
)
def q33_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (1 h window, 15 min slide) as a batch query — each
    event lands in exactly 4 overlapping windows; identical semantics to the
    streaming sliding_counts (streaming/pipeline.py)."""
    events = _t(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
        )
    )


@register(
    "llm_embedding_stats",
    """
    SELECT label,
           count(*) AS n_vectors,
           round(avg(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                           CAST(embedding AS DOUBLE[])))), 6)
             AS avg_norm,
           round(max(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                           CAST(embedding AS DOUBLE[])))), 6)
             AS max_norm
    FROM embeddings
    GROUP BY label
    """,
)
def llm_embedding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from crowdsorsa_etl_spark.operators.similarity import l2_norm

    emb = _t(spark, sf_dir, "embeddings")
    norm = l2_norm(F.col("embedding"))
    return emb.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.round(F.avg(norm), 6).alias("avg_norm"),
        F.round(F.max(norm), 6).alias("max_norm"),
    )


def _cosine_topk_oracle_sql() -> str:
    from crowdsorsa_etl_spark.queries.llm_pack import COSINE_TOPK_ORACLE_SQL

    return COSINE_TOPK_ORACLE_SQL


@register("llm_cosine_topk_vectorized", _cosine_topk_oracle_sql())
def llm_cosine_topk_vectorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """numpy/BLAS variant of llm_cosine_topk — hash-oracled since round 7:
    BLAS selects top-(k+margin) candidates at memory bandwidth, then the
    expression path re-scores them with the oracle's exact accumulation
    order and rounding, so the output is bit-identical to llm_cosine_topk
    (shared oracle SQL). The BLAS/expression agreement test remains in
    tests/test_operators.py."""
    from crowdsorsa_etl_spark.operators.similarity import cosine_topk_vectorized

    emb = _t(spark, sf_dir, "embeddings")
    return cosine_topk_vectorized(emb, emb.filter(F.col("vec_id") < 10), k=5)


# ===========================================================================
# Relational core, batch 3 (dates, array HOFs, unpivot, conditional aggs)
# ===========================================================================


@register(
    "q34_date_funcs",
    """
    SELECT o_orderkey,
           strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date,
           CAST(date_diff('day', o_orderdate, TIMESTAMP '2000-01-01 00:00:00')
                AS INT) AS days_to_y2k,
           strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           CAST(weekofyear(o_orderdate) AS INT) AS iso_week,
           CAST(dayofyear(o_orderdate) AS INT) AS doy,
           CAST(quarter(o_orderdate) AS INT) AS qtr
    FROM orders
    WHERE o_orderkey < 2000
    """,
)
def q34_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time scalar surface (reference S11-S12 family, generalized)."""
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    d = F.col("o_orderdate")
    return orders.select(
        "o_orderkey",
        F.date_format(F.date_add(d, 30), "yyyy-MM-dd").alias("due_date"),
        F.datediff(F.lit("2000-01-01").cast("date"), d).alias("days_to_y2k"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
        F.date_format(F.trunc(d, "month"), "yyyy-MM-dd").alias("month_start"),
        F.weekofyear(d).alias("iso_week"),
        F.dayofyear(d).alias("doy"),
        F.quarter(d).alias("qtr"),
    )


@register(
    "q35_array_hofs",
    """
    SELECT p_partkey,
           array_to_string(list_transform(string_split(p_type, ' '),
                                          x -> upper(x)), ',') AS type_upper,
           coalesce(array_to_string(list_filter(string_split(p_type, ' '),
                                    x -> length(x) > 5), ','), '') AS long_words,
           CAST(list_aggregate(list_transform(string_split(p_type, ' '),
                                              x -> length(x)), 'sum') AS BIGINT)
             AS total_len,
           array_to_string(list_sort(string_split(p_type, ' ')), ',') AS sorted_words,
           list_contains(string_split(p_type, ' '), 'STEEL') AS has_steel,
           CAST(len(string_split(p_type, ' ')) AS INT) AS n_words
    FROM part
    """,
)
def q35_array_hofs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order functions (transform/filter/aggregate/sort) — the
    JVM-side expression surface the engine prefers over any UDF."""
    part = _t(spark, sf_dir, "part")
    arr = F.split("p_type", " ", -1)
    return part.select(
        "p_partkey",
        F.array_join(F.transform(arr, lambda x: F.upper(x)), ",").alias("type_upper"),
        F.array_join(
            F.filter(arr, lambda x: F.length(x) > 5), ","
        ).alias("long_words"),
        F.aggregate(
            F.transform(arr, lambda x: F.length(x).cast("bigint")),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias("total_len"),
        F.array_join(F.array_sort(arr), ",").alias("sorted_words"),
        F.array_contains(arr, "STEEL").alias("has_steel"),
        F.size(arr).alias("n_words"),
    )


@register(
    "q36_unpivot",
    """
    SELECT c_custkey, metric, val FROM (
      SELECT c_custkey, 'acctbal' AS metric, round(c_acctbal, 2) AS val
      FROM customer
      UNION ALL
      SELECT c_custkey, 'nationkey', CAST(c_nationkey AS DOUBLE) FROM customer
    )
    """,
)
def q36_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide→long) via stack — the inverse of q15's pivot."""
    customer = _t(spark, sf_dir, "customer")
    return customer.select(
        "c_custkey",
        F.expr(
            "stack(2, 'acctbal', round(c_acctbal, 2),"
            "         'nationkey', cast(c_nationkey as double))"
        ).alias("metric", "val"),
    )


@register(
    "q37_conditional_aggs",
    """
    SELECT l_returnflag,
           CAST(count_if(l_discount > 0.05) AS BIGINT) AS n_discounted,
           bool_and(l_quantity > 0) AS all_positive_qty,
           bool_or(l_tax > 0.07) AS any_high_tax,
           CAST(count_if(l_linestatus = 'O') AS BIGINT) AS n_open,
           round(sum(CASE WHEN l_discount > 0.05
                          THEN l_extendedprice * l_discount END), 2) AS disc_revenue
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q37_conditional_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count_if(F.col("l_discount") > 0.05).alias("n_discounted"),
        F.bool_and(F.col("l_quantity") > 0).alias("all_positive_qty"),
        F.bool_or(F.col("l_tax") > 0.07).alias("any_high_tax"),
        F.count_if(F.col("l_linestatus") == "O").alias("n_open"),
        F.round(
            F.sum(
                F.when(
                    F.col("l_discount") > 0.05,
                    F.col("l_extendedprice") * F.col("l_discount"),
                )
            ),
            2,
        ).alias("disc_revenue"),
    )


@register(
    "llm_trigram_topk",
    """
    SELECT tri, n, rank FROM (
      SELECT tri, n, CAST(row_number() OVER (ORDER BY n DESC, tri ASC) AS INT) AS rank
      FROM (SELECT substr(text, CAST(i AS INT), 3) AS tri, count(*) AS n
            FROM (SELECT text, unnest(range(1, greatest(len(text) - 1, 1))) AS i
                  FROM documents WHERE len(text) >= 3)
            GROUP BY 1)
    ) WHERE rank <= 20
    """,
)
def llm_trigram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-trigram corpus profile (document fingerprinting building
    block): explode positions JVM-side, count, deterministic top-20."""
    docs = _t(spark, sf_dir, "documents").filter(F.length("text") >= 3)
    tris = docs.select(
        F.explode(
            F.sequence(F.lit(1), F.greatest(F.length("text") - 2, F.lit(1)))
        ).alias("i"),
        "text",
    ).select(F.substring(F.col("text"), F.col("i"), 3).alias("tri"))
    counts = tris.groupBy("tri").agg(F.count(F.lit(1)).alias("n"))
    # orderBy+limit → TakeOrderedAndProject (per-partition heaps), THEN rank
    # the surviving 20 rows; a bare global row_number window would drag every
    # distinct trigram count into a single partition
    top = counts.orderBy(F.col("n").desc(), F.col("tri").asc()).limit(20)
    w = Window.orderBy(F.col("n").desc(), F.col("tri").asc())
    return top.withColumn("rank", F.row_number().over(w)).select("tri", "n", "rank")


