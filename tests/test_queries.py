"""Differential check of the query registry against DuckDB at sf0.001
(the fast in-suite version of tools/check_oracle.py; the driver runs the
same comparison at sf0.01)."""

from __future__ import annotations

import duckdb
import pytest

from crowdsorsa_etl_spark.queries import ORACLES, QUERIES
from crowdsorsa_etl_spark.schemas import FIXTURE_TABLES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in FIXTURE_TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, duck, name):
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from check_oracle import compare

    spark_pdf = QUERIES[name](spark, SF_DIR).toPandas()
    oracle_pdf = duck.sql(ORACLES[name]).df()
    errs = compare(name, spark_pdf, oracle_pdf)
    assert not errs, errs


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


class TestHLLSketches:
    def test_estimates_within_5pct_of_exact(self, spark):
        """q47's bound verdicts must hold, and its n_exact column must agree
        with an independently computed exact distinct (the query now emits
        exact + bound-verdict so the DuckDB oracle is falsifiable)."""
        from crowdsorsa_etl_spark.queries import QUERIES
        from crowdsorsa_etl_spark.sources.parquet import load_table

        got = {
            r.l_returnflag: r
            for r in QUERIES["q47_hll_sketches"](spark, "/root/testdata/sf0.001").collect()
        }
        li = load_table(spark, "lineitem", "/root/testdata/sf0.001")
        from pyspark.sql import functions as F

        exact = {
            r.l_returnflag: r.n
            for r in li.groupBy("l_returnflag")
            .agg(F.countDistinct("l_partkey").alias("n"))
            .collect()
        }
        exact["ALL"] = li.select("l_partkey").distinct().count()
        assert set(got) == set(exact)
        for k, row in got.items():
            assert row.n_exact == exact[k], (k, row.n_exact, exact[k])
            assert row.sketch_within_bound, k
