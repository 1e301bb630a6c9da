"""Crowdsorsa reference-parity pipelines (flagship + doc fields).

Split from the original monolithic queries.py in round 5. Registration
ORDER is load-bearing (the driver's correctness window samples the first 50
registrations), so modules are imported in the original file order by
queries/__init__.py, which also asserts the canonical order afterwards.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from crowdsorsa_etl_spark import lsh_oracles  # noqa: F401
from crowdsorsa_etl_spark.queries._shared import (
    _t,
    register,
)

# ===========================================================================
# Crowdsorsa parity pipelines under FULL independent-engine oracles (round 7):
# the observation fixtures persist once to parquet (parity_oracles), both
# engines read the identical bytes, and DuckDB replays the whole pipeline —
# WKB parse, ring close, geodesic/planar area, doc assembly — byte-comparing
# the emitted JSON. The golden tests in tests/test_docmodel.py remain the
# trap-by-trap unit gates.
# ===========================================================================

from crowdsorsa_etl_spark import parity_oracles


@register("crowdsorsa_documents_2023", parity_oracles.documents_2023_sql())
def crowdsorsa_documents_2023(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference parity 2023 (crowdsorsa-etl-2023.R:46-228) over the
    persisted observation fixture, full-document JSON hash-oracled."""
    from crowdsorsa_etl_spark.pipelines.crowdsorsa import documents_2023
    from crowdsorsa_etl_spark.schemas import MUNICIPALITY_KEY, OBSERVATIONS_2023

    d = parity_oracles.ensure_observation_fixtures()
    obs = spark.read.schema(OBSERVATIONS_2023).parquet(
        f"{d}/observations_2023.parquet"
    )
    dim = spark.read.schema(MUNICIPALITY_KEY).parquet(f"{d}/municipality_key.parquet")
    return documents_2023(obs, dim).select("obs_id", "document_json")


@register("crowdsorsa_documents_2024", parity_oracles.documents_2024_sql())
def crowdsorsa_documents_2024(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference parity 2024 (crowdsorsa-etl-2024.R:42-190), same scheme."""
    from crowdsorsa_etl_spark.pipelines.crowdsorsa import documents_2024
    from crowdsorsa_etl_spark.schemas import OBSERVATIONS_2024

    d = parity_oracles.ensure_observation_fixtures()
    obs = spark.read.schema(OBSERVATIONS_2024).parquet(
        f"{d}/observations_2024.parquet"
    )
    return documents_2024(obs).select("obs_id", "document_json")


@register("llm_dedup_clusters", lsh_oracles.dedup_clusters_sql())
def llm_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash candidates → connected components → per-doc cluster + keep
    flag (the full near-dedup pipeline). Oracle since round 6: component =
    min doc id in the component is an iteration-free deterministic result,
    so DuckDB recomputes it with a recursive transitive-closure CTE over
    the same portable-hash edges (lsh_oracles.dedup_clusters_sql); Spark's
    pointer-doubling iteration stays gated by its own convergence tests."""
    from crowdsorsa_etl_spark.queries._shared import _dedup_cluster_assign

    return _dedup_cluster_assign(spark, sf_dir)


@register(
    "q38_salted_distinct",
    """
    SELECT l_returnflag,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_distinct_l_partkey
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q38_salted_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe two-stage distinct count — must agree exactly with the
    naive COUNT(DISTINCT) oracle."""
    from crowdsorsa_etl_spark.operators.skew import salted_distinct_count

    li = _t(spark, sf_dir, "lineitem")
    return salted_distinct_count(
        li, group_col="l_returnflag", distinct_col="l_partkey"
    ).withColumn("n_distinct_l_partkey", F.col("n_distinct_l_partkey").cast("bigint"))


@register(
    "q39_salted_join",
    """
    SELECT o_orderpriority, count(*) AS n, round(sum(l_quantity), 2) AS qty
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def q39_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted fact⋈dim join — same answer as the plain join oracle, but a
    hot l_orderkey would spread over 8 reducers."""
    from crowdsorsa_etl_spark.operators.skew import salted_join

    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    joined = salted_join(
        li, orders, fact_key="l_orderkey", dim_key="o_orderkey",
        salt_buckets=8, salt_source="l_linenumber",
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_quantity"), 2).alias("qty"),
    )


@register(
    "q40_approx_aggs",
    """
    SELECT l_returnflag,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_exact,
           TRUE AS hll_within_bound,
           TRUE AS median_within_bound
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q40_approx_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate aggregates (HLL distinct, t-digest percentile) — the
    100 TB substitutes for q10/q21 — under an ERROR-BOUND oracle (round 7).

    Sketch estimates are engine-specific by design, so the raw values can
    never hash-match a different engine; instead both sides emit the EXACT
    per-group distinct count plus boolean bound verdicts. A hash match
    therefore proves (a) the exact counts agree with DuckDB and (b) Spark's
    sketch landed within its documented bound of that independently-checked
    truth — falsifiable, unlike the old rows-only record:
    * HLL: |approx − exact| ≤ 3·rsd·exact (rsd = 0.02 → 6%, a ≥3σ bound);
    * percentile_approx(accuracy=1000): returned value must lie between the
      exact 0.495 and 0.505 quantiles (rank error ≤ 1/accuracy · n/2·5).
    """
    li = _t(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("_approx_parts"),
        F.countDistinct("l_partkey").alias("n_exact"),
        F.percentile_approx("l_extendedprice", 0.5, 1000).alias("_approx_median"),
        F.expr(
            "percentile(l_extendedprice, array(0.495, 0.505))"
        ).alias("_median_band"),
    )
    return agg.select(
        "l_returnflag",
        F.col("n_exact").cast("bigint").alias("n_exact"),
        (
            F.abs(F.col("_approx_parts") - F.col("n_exact"))
            <= 3 * 0.02 * F.col("n_exact")
        ).alias("hll_within_bound"),
        F.col("_approx_median").between(
            F.col("_median_band")[0], F.col("_median_band")[1]
        ).alias("median_within_bound"),
    )


@register(
    "q41_cube",
    """
    SELECT l_returnflag, l_linestatus,
           count(*) AS n, round(sum(l_extendedprice), 2) AS revenue
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q41_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
    )


@register(
    "q42_collect_agg",
    """
    SELECT n_nationkey,
           array_to_string(list_sort(list(DISTINCT c_mktsegment)), ',') AS segments,
           CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS n_segments
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_nationkey
    """,
)
def q42_collect_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set (array-per-entity, the reference's S23/S25 pattern when
    entities have >1 member) — sorted + joined for deterministic compare."""
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    return (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_nationkey")
        .agg(
            F.array_join(F.sort_array(F.collect_set("c_mktsegment")), ",").alias(
                "segments"
            ),
            F.countDistinct("c_mktsegment").alias("n_segments"),
        )
    )


@register(
    "q43_shipping_priority",
    """
    SELECT l_orderkey, revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate, o_orderpriority
    FROM (SELECT l_orderkey, o_orderdate, o_orderpriority,
                 round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
          FROM customer
          JOIN orders   ON c_custkey = o_custkey
          JOIN lineitem ON l_orderkey = o_orderkey
          WHERE c_mktsegment = 'BUILDING'
            AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
            AND l_shipdate  > TIMESTAMP '1997-01-01 00:00:00'
          GROUP BY l_orderkey, o_orderdate, o_orderpriority)
    ORDER BY revenue DESC, l_orderkey ASC
    LIMIT 10
    """,
)
def q43_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join with selective predicates on all three
    tables (Catalyst pushes each below its join), agg, global top-10."""
    customer = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1997-01-01 00:00:00"
    )
    lineitem = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > "1997-01-01 00:00:00"
    )
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey)
        .join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
    )


@register(
    "q44_regional_volume",
    """
    SELECT n_name,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS volume
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name IN ('ASIA', 'EUROPE')
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def q44_regional_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: snowflake join with a region filter that prunes
    through two broadcast dims before touching the facts."""
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01 00:00:00")
        & (F.col("o_orderdate") < "1998-01-01 00:00:00")
    )
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(
        F.col("r_name").isin("ASIA", "EUROPE")
    )
    dims = F.broadcast(
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return (
        customer.join(dims, customer.c_nationkey == dims.n_nationkey)
        .join(orders, customer.c_custkey == orders.o_custkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("volume"),
        )
    )


@register(
    "q45_bination_volume",
    """
    SELECT cn.n_name AS cust_nation,
           sn.n_name AS supp_nation,
           CAST(year(l_shipdate) AS INT) AS ship_year,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS volume
    FROM lineitem
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation cn ON cn.n_nationkey = c_nationkey
    JOIN nation sn ON sn.n_nationkey = s_nationkey
    WHERE ((cn.n_name = 'NATION_3' AND sn.n_name = 'NATION_7')
        OR (cn.n_name = 'NATION_7' AND sn.n_name = 'NATION_3'))
    GROUP BY 1, 2, 3
    """,
)
def q45_bination_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: the same dim table joined TWICE under different
    aliases (customer's nation and supplier's nation) with a symmetric
    pair predicate — both nation sides broadcast; the fact chain shuffles
    only on its join keys."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    supplier = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    cn = F.broadcast(nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    ))
    sn = F.broadcast(nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    ))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(supplier, li.l_suppkey == supplier.s_suppkey)
        .join(cn, customer.c_nationkey == F.col("cn_key"))
        .join(sn, supplier.s_nationkey == F.col("sn_key"))
        .filter(
            ((F.col("cust_nation") == "NATION_3") & (F.col("supp_nation") == "NATION_7"))
            | ((F.col("cust_nation") == "NATION_7") & (F.col("supp_nation") == "NATION_3"))
        )
        .groupBy(
            "cust_nation",
            "supp_nation",
            F.year("l_shipdate").cast("int").alias("ship_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("volume")
        )
    )


@register(
    "q47_hll_sketches",
    """
    SELECT l_returnflag,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_exact,
           TRUE AS sketch_within_bound
    FROM lineitem GROUP BY l_returnflag
    UNION ALL
    SELECT 'ALL' AS l_returnflag,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_exact,
           TRUE AS sketch_within_bound
    FROM lineitem
    """,
)
def q47_hll_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HLL sketches (Apache DataSketches via hll_sketch_agg) —
    the re-aggregatable distinct-count pattern 100 TB rollups need: group
    sketches persist/merge WITHOUT rescanning the facts (the 'ALL' row is
    built by unioning the per-group sketches, not by a second scan).

    ERROR-BOUND oracle (round 7; see q40 for the scheme): sketch estimates
    can't hash-match across engines, so both sides emit the exact distinct
    counts (per group AND for the merged-'ALL' row) plus a boolean asserting
    the estimate is within 5% of exact — the per-round falsifiable form of
    the accuracy gate that also lives in tests/test_queries.py."""
    li = _t(spark, sf_dir, "lineitem")
    per = li.groupBy("l_returnflag").agg(
        F.hll_sketch_agg("l_partkey").alias("sk"),
        F.countDistinct("l_partkey").alias("n_exact"),
    )
    per_est = per.select(
        "l_returnflag",
        F.col("n_exact").cast("bigint").alias("n_exact"),
        (
            F.abs(F.hll_sketch_estimate("sk") - F.col("n_exact"))
            <= 0.05 * F.col("n_exact")
        ).alias("sketch_within_bound"),
    )
    # the ALL row merges the per-group SKETCHES (no second fact scan for the
    # estimate); its exact count needs its own distinct, computed here once
    exact_all = li.agg(F.countDistinct("l_partkey").alias("n_exact"))
    total = (
        per.agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("_approx_all")
        )
        .crossJoin(exact_all)
        .select(
            F.lit("ALL").alias("l_returnflag"),
            F.col("n_exact").cast("bigint").alias("n_exact"),
            (
                F.abs(F.col("_approx_all") - F.col("n_exact"))
                <= 0.05 * F.col("n_exact")
            ).alias("sketch_within_bound"),
        )
    )
    return per_est.unionByName(total)


