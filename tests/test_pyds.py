"""Python DataSource API: packaged dims as first-class planned scans."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crowdsorsa_etl_spark.sources.observations import municipality_dim, taxon_dim
from crowdsorsa_etl_spark.sources.pyds import register


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register(spark)


class TestPythonDataSource:
    def test_municipalities_match_createDataFrame_dim(self, spark):
        got = (
            spark.read.format("crowdsorsa_dim")
            .option("name", "municipalities")
            .load()
        )
        want = municipality_dim(spark)
        # schemas match up to nullability (the DataSource API defaults to
        # nullable fields)
        assert [(f.name, f.dataType) for f in got.schema.fields] == [
            (f.name, f.dataType) for f in want.schema.fields
        ]
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        )

    def test_taxa_dim(self, spark):
        got = (
            spark.read.format("crowdsorsa_dim").option("name", "taxa").load()
        )
        want = taxon_dim(spark)
        assert got.count() == want.count() > 0
        assert set(got.columns) == set(want.columns)

    def test_read_is_partitioned(self, spark):
        got = (
            spark.read.format("crowdsorsa_dim")
            .option("name", "municipalities")
            .load()
        )
        n_parts = got.rdd.getNumPartitions()
        assert n_parts == 2

    def test_column_pruning_applies(self, spark):
        got = (
            spark.read.format("crowdsorsa_dim")
            .option("name", "municipalities")
            .load()
            .select("kunta")
        )
        assert len(got.columns) == 1
        assert got.count() == 309

    def test_unknown_dim_raises(self, spark):
        with pytest.raises(Exception, match="unknown dim"):
            (
                spark.read.format("crowdsorsa_dim")
                .option("name", "nope")
                .load()
                .collect()
            )
