"""Remaining UDF/UDTF surface (SURVEY §2.2): grouped-map applyInPandas,
Python UDTF, schema_of_json. Policy stays built-in-first — these exist for
the cases built-ins can't express."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from crowdsorsa_etl_spark.sources.parquet import load_table

SF_DIR = "/root/testdata/sf0.001"


class TestGroupedMap:
    def test_zscore_per_group(self, spark):
        """Per-nation account-balance z-scores — grouped-map applyInPandas
        (the UDAF-like shape: whole group in, whole group out)."""
        customer = load_table(spark, "customer", SF_DIR)

        def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
            std = pdf["c_acctbal"].std(ddof=0)
            pdf["z"] = 0.0 if std == 0 else (pdf["c_acctbal"] - pdf["c_acctbal"].mean()) / std
            return pdf[["c_custkey", "c_nationkey", "z"]]

        out = (
            customer.groupBy("c_nationkey")
            .applyInPandas(zscore, "c_custkey long, c_nationkey int, z double")
        )
        pdf = out.toPandas()
        assert len(pdf) == customer.count()
        # per-group mean(z) ~ 0
        for _, grp in pdf.groupby("c_nationkey"):
            assert abs(grp["z"].mean()) < 1e-9


class TestUdtf:
    def test_python_udtf_explodes_rows(self, spark):
        from pyspark.sql.functions import lit, udtf

        @udtf(returnType="word: string, pos: int")
        class SplitWords:
            def eval(self, text: str):
                for i, w in enumerate(text.split(" ")):
                    yield w, i

        got = SplitWords(lit("a b c")).collect()
        assert [(r.word, r.pos) for r in got] == [("a", 0), ("b", 1), ("c", 2)]


class TestSchemaOfJson:
    def test_schema_inference_literal(self, spark):
        row = spark.range(1).select(
            F.schema_of_json(F.lit('{"k": 7}')).alias("s")
        ).first()
        assert "k" in row.s and "BIGINT" in row.s.upper()

    def test_parse_props_with_inferred_schema(self, spark):
        events = load_table(spark, "events", SF_DIR).limit(100)
        sample = events.select("props").first().props
        schema_str = (
            spark.range(1).select(F.schema_of_json(F.lit(sample)).alias("s")).first().s
        )
        parsed = events.select(F.from_json("props", schema_str).alias("p"))
        assert parsed.filter(F.col("p.k").isNotNull()).count() > 0
