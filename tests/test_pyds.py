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


class TestStreamingPythonDataSource:
    def test_bounded_stream_delivers_every_offset_once(self, spark, tmp_path):
        from crowdsorsa_etl_spark.sources import pyds

        pyds.register(spark)
        q = (
            spark.readStream.format("crowdsorsa_event_gen")
            .option("rowsPerBatch", 40)
            .option("maxRows", 150)
            .load()
            .writeStream.format("memory")
            .queryName("evgen")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = spark.sql("SELECT * FROM evgen").collect()
        assert len(got) == 150
        assert {r.event_id for r in got} == set(range(150))
        # determinism: the generator is pure in the offset
        by_id = {r.event_id: (r.user_id, r.event_type, r.value) for r in got}
        h = (7 * 2654435761 + 40503) & 0xFFFFFFFF
        assert by_id[7] == (h % 1000, ("view", "click", "purchase")[h % 3],
                            round((h % 10_000) / 100.0, 2))

    def test_restart_resumes_from_checkpoint_offset(self, spark, tmp_path):
        """Stop mid-stream, restart with the same checkpoint: offsets
        resume — every event id delivered exactly once across both runs."""
        from crowdsorsa_etl_spark.sources import pyds

        pyds.register(spark)
        ck = str(tmp_path / "ck2")
        out = str(tmp_path / "out2")

        def run(max_rows: int):
            q = (
                spark.readStream.format("crowdsorsa_event_gen")
                .option("rowsPerBatch", 30)
                .option("maxRows", max_rows)
                .load()
                .writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", ck)
                .start()
            )
            try:
                q.processAllAvailable()
            finally:
                q.stop()

        run(60)   # first run: offsets 0..59 committed
        run(200)  # restart: must continue at 60, not replay
        ids = sorted(r.event_id for r in spark.read.parquet(out).collect())
        assert ids == list(range(200))  # exactly once across both runs
