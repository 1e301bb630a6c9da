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


class TestCogroupedMap:
    def test_cogroup_per_key_merge_asof(self, spark):
        """Cogrouped applyInPandas — the two-table grouped-map surface:
        both sides of a key arrive as pandas frames in one call (the shape
        for per-key merge_asof / custom interval matching). Validated
        against the distributed asof_join operator on the same inputs."""
        from crowdsorsa_etl_spark.operators.asof import asof_join

        events = load_table(spark, "events", SF_DIR).select(
            "user_id", "event_id", "ts", "value"
        )
        # per-user "checkpoints": every 10th event acts as the probe side
        probes = events.filter(F.col("event_id") % 10 == 0).select(
            "user_id", F.col("event_id").alias("probe_id"),
            F.col("ts").alias("pts"),
        )

        def per_key(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
            left = left.sort_values("pts")
            right = right.sort_values("ts")
            merged = pd.merge_asof(
                left, right, left_on="pts", right_on="ts",
                direction="backward",
            )
            return merged[["user_id_x", "probe_id", "event_id"]].rename(
                columns={"user_id_x": "user_id"}
            )

        got = (
            probes.groupBy("user_id")
            .cogroup(events.groupBy("user_id"))
            .applyInPandas(
                per_key, "user_id long, probe_id long, event_id long"
            )
        )
        want = asof_join(
            probes,
            events.select("user_id", "event_id", "ts"),
            on="user_id",
            left_time="pts",
            right_time="ts",
            right_payload=["event_id"],
            tiebreak="event_id",
        ).select("user_id", "probe_id", "event_id")
        g = {(r.user_id, r.probe_id): r.event_id for r in got.collect()}
        w = {(r.user_id, r.probe_id): r.event_id for r in want.collect()}
        assert len(g) > 0
        assert g == w


class TestVariant:
    """Spark 4 VARIANT: schema-flexible semi-structured values as a typed
    column (the open-schema alternative to rigid from_json structs) — the
    right type for `events.props` when producers drift."""

    def test_parse_extract_roundtrip(self, spark):
        events = load_table(spark, "events", SF_DIR).limit(200)
        v = events.select(
            "event_id", F.parse_json("props").alias("v")
        )
        assert dict(v.dtypes)["v"] == "variant"
        got = v.select(
            "event_id",
            F.variant_get("v", "$.k", "int").alias("k"),
            F.to_json("v").alias("back"),
        )
        rows = got.collect()
        want = {
            r.event_id: r.props for r in events.select("event_id", "props").collect()
        }
        import json as _json

        for r in rows:
            orig = _json.loads(want[r.event_id])
            assert r.k == orig["k"]
            assert _json.loads(r.back) == orig

    def test_variant_survives_parquet(self, spark, tmp_path):
        events = load_table(spark, "events", SF_DIR).limit(50)
        v = events.select("event_id", F.parse_json("props").alias("v"))
        path = str(tmp_path / "variant_pq")
        v.write.parquet(path)
        back = spark.read.parquet(path)
        assert dict(back.dtypes)["v"] == "variant"
        assert (
            back.select(F.variant_get("v", "$.k", "int").alias("k"))
            .filter(F.col("k").isNotNull())
            .count()
            == 50
        )

    def test_schema_of_variant_agg(self, spark):
        events = load_table(spark, "events", SF_DIR).limit(100)
        schemas = (
            events.select(
                F.schema_of_variant(F.parse_json("props")).alias("s")
            )
            .distinct()
            .collect()
        )
        assert len(schemas) == 1
        assert "k: BIGINT" in schemas[0].s


class TestMapHigherOrderFunctions:
    """Map-typed column surface: construction, HOF transforms, entry
    explosion — the engine-general map algebra (SURVEY §2.2 map fns)."""

    def test_map_construct_transform_filter(self, spark):
        df = spark.createDataFrame(
            [(1, ["a", "b"], [10, 20]), (2, ["x"], [7])],
            "id long, ks array<string>, vs array<int>",
        )
        out = df.select(
            "id",
            F.map_from_arrays("ks", "vs").alias("m"),
        ).select(
            "id",
            F.transform_values("m", lambda k, v: v * 2).alias("doubled"),
            F.transform_keys("m", lambda k, v: F.upper(k)).alias("upkeys"),
            F.map_filter("m", lambda k, v: v > 15).alias("big"),
            F.map_concat(
                "m", F.create_map(F.lit("z"), F.lit(99))
            ).alias("extended"),
        )
        r = {x.id: x for x in out.collect()}
        assert dict(r[1].doubled) == {"a": 20, "b": 40}
        assert dict(r[1].upkeys) == {"A": 10, "B": 20}
        assert dict(r[1].big) == {"b": 20}
        assert dict(r[2].extended) == {"x": 7, "z": 99}

    def test_map_zip_with_and_entries(self, spark):
        df = spark.createDataFrame(
            [(1,)], "id long"
        ).select(
            F.create_map(F.lit("a"), F.lit(1), F.lit("b"), F.lit(2)).alias("m1"),
            F.create_map(F.lit("a"), F.lit(10), F.lit("c"), F.lit(30)).alias("m2"),
        )
        out = df.select(
            F.map_zip_with(
                "m1", "m2", lambda k, v1, v2: F.coalesce(v1, F.lit(0)) + F.coalesce(v2, F.lit(0))
            ).alias("merged"),
            F.map_entries("m1").alias("entries"),
        ).collect()[0]
        assert dict(out.merged) == {"a": 11, "b": 2, "c": 30}
        assert [(e.key, e.value) for e in out.entries] == [("a", 1), ("b", 2)]

    def test_explode_map_roundtrip(self, spark):
        events = load_table(spark, "events", SF_DIR).limit(50)
        m = events.select(
            "event_id",
            F.create_map(
                F.lit("type"), F.col("event_type"),
                F.lit("uid"), F.col("user_id").cast("string"),
            ).alias("m"),
        )
        exploded = m.select("event_id", F.explode("m").alias("k", "v"))
        back = exploded.groupBy("event_id").agg(
            F.map_from_entries(
                F.sort_array(F.collect_list(F.struct("k", "v")))
            ).alias("m2")
        )
        assert back.count() == 50
        joined = m.join(back, "event_id").filter(
            F.col("m")["type"] != F.col("m2")["type"]
        )
        assert joined.count() == 0


class TestGroupedAggPandasUdf:
    def test_grouped_agg_in_groupby_and_window(self, spark):
        """GROUPED_AGG pandas_udf — the vectorized UDAF: one scalar per
        group, usable both in groupBy().agg and OVER a window."""
        import numpy as np
        from pyspark.sql import Window
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("double")
        def iqr(v: pd.Series) -> float:
            return float(np.percentile(v, 75) - np.percentile(v, 25))

        events = load_table(spark, "events", SF_DIR)
        agg = events.groupBy("event_type").agg(iqr("value").alias("iqr"))
        rows = {r.event_type: r.iqr for r in agg.collect()}
        pdf = events.select("event_type", "value").toPandas()
        for et, got in rows.items():
            vals = pdf[pdf.event_type == et]["value"]
            want = float(np.percentile(vals, 75) - np.percentile(vals, 25))
            assert abs(got - want) < 1e-9, et

        w = Window.partitionBy("event_type")
        windowed = events.select("event_id", "event_type", iqr("value").over(w).alias("iqr"))
        sample = windowed.limit(50).collect()
        for r in sample:
            assert abs(r.iqr - rows[r.event_type]) < 1e-9


class TestMapInArrow:
    def test_map_in_arrow_batch_transform(self, spark):
        """mapInArrow: raw Arrow RecordBatch in/out — the zero-copy tier
        below mapInPandas for byte-level work."""
        import pyarrow as pa

        def double_value(batches):
            for batch in batches:
                tbl = pa.table(
                    {
                        "event_id": batch.column("event_id"),
                        "doubled": pa.compute.multiply(
                            batch.column("value"), pa.scalar(2.0)
                        ),
                    }
                )
                for out in tbl.to_batches():
                    yield out

        events = load_table(spark, "events", SF_DIR).select("event_id", "value")
        got = events.mapInArrow(double_value, "event_id long, doubled double")
        joined = got.join(events, "event_id")
        bad = joined.filter(
            F.abs(F.col("doubled") - 2 * F.col("value")) > 1e-12
        )
        assert bad.count() == 0
        assert got.count() == events.count()


class TestSqlRegisteredUdf:
    def test_python_udf_callable_from_sql(self, spark):
        """spark.udf.register: the (slow-path, documented-as-such) escape
        hatch is wired — a Python UDF invocable from the SQL surface."""
        from pyspark.sql import types as T

        spark.udf.register(
            "py_luhn_digit",
            lambda s: sum(int(c) for c in str(s)) % 10,
            T.IntegerType(),
        )
        events = load_table(spark, "events", SF_DIR).limit(100)
        events.createOrReplaceTempView("udf_events")
        got = spark.sql(
            "SELECT event_id, py_luhn_digit(event_id) AS d FROM udf_events"
        ).collect()
        assert len(got) == 100
        for r in got:
            assert r.d == sum(int(c) for c in str(r.event_id)) % 10


class TestChunkUdtf:
    """Python UDTF surface (functions/udtfs.py): Arrow-optimized lateral
    table function, span math, offset exactness."""

    def test_chunk_spans_edges(self):
        from crowdsorsa_etl_spark.functions.udtfs import chunk_spans

        assert chunk_spans(1) == [(0, 1)]
        assert chunk_spans(32) == [(0, 32)]
        assert chunk_spans(33) == [(0, 32), (24, 33)]
        assert chunk_spans(128) == [
            (0, 32), (24, 56), (48, 80), (72, 104), (96, 128),
        ]
        # every word is covered and starts strictly increase
        for n in (1, 7, 31, 32, 33, 56, 57, 100, 500):
            spans = chunk_spans(n)
            assert spans[0][0] == 0 and spans[-1][1] == n
            assert all(a[0] < b[0] for a, b in zip(spans, spans[1:]))

    def test_lateral_join_plan_is_arrow_and_pruned(self, spark):
        from crowdsorsa_etl_spark.functions.udtfs import register_udtfs

        register_udtfs(spark)
        spark.createDataFrame(
            [(1, "a b c"), (2, "x " * 40)], "doc_id long, text string"
        ).createOrReplaceTempView("_udtf_t")
        df = spark.sql(
            "SELECT d.doc_id, c.* FROM _udtf_t d, LATERAL chunk_words(d.text) c"
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        # Arrow-batched UDTF, not row-at-a-time Python
        assert "ArrowEvalPythonUDTF" in plan
        assert "BatchEvalPythonUDTF" not in plan

    def test_offsets_slice_back_to_chunk(self, spark):
        from crowdsorsa_etl_spark.functions.udtfs import register_udtfs

        register_udtfs(spark)
        text = " ".join(f"w{i}" for i in range(70))
        spark.createDataFrame(
            [(1, text)], "doc_id long, text string"
        ).createOrReplaceTempView("_udtf_t2")
        rows = spark.sql(
            "SELECT c.* FROM _udtf_t2 d, LATERAL chunk_words(d.text) c "
            "ORDER BY c.chunk_idx"
        ).collect()
        assert [r["start_word"] for r in rows] == [0, 24, 48]
        for r in rows:
            assert text[r["start_off"]: r["end_off"]] == r["chunk"]
