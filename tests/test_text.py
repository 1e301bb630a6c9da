"""Text-function unit + property tests (hypothesis)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from crowdsorsa_etl_spark.functions.text import (
    detect_language,
    fix_year_typo,
    repair_mojibake,
    shingles,
    token_count,
)


def _one(spark, col, value: str):
    df = spark.createDataFrame([(value,)], "s string")
    return df.select(col.alias("out")).first().out


class TestCleaners:
    def test_mojibake(self, spark):
        assert _one(spark, repair_mojibake(F.col("s")), "jÃ¤ttipalsami") == "jättipalsami"
        assert _one(spark, repair_mojibake(F.col("s")), "karhunkÃ¶ynnÃ¶s") == "karhunköynnös"

    def test_year_typo_first_occurrence_only(self, spark):
        assert _one(spark, fix_year_typo(F.col("s")), "2026-07-01") == "2024-07-01"
        # a 2026 NOT at the start (e.g. day field) must survive — R sub()
        # replaces the first occurrence, which for dates is the year prefix
        assert _one(spark, fix_year_typo(F.col("s")), "2024-20-2026") == "2024-20-2026"

    def test_token_count(self, spark):
        assert _one(spark, token_count(F.col("s")).cast("int"), "a b  c") == 3
        assert _one(spark, token_count(F.col("s")).cast("int"), "   ") == 0
        assert _one(spark, token_count(F.col("s")).cast("int"), "") == 0


class TestShingles:
    def test_basic(self, spark):
        got = _one(spark, shingles(F.col("s"), k=2), "a b c")
        assert got == ["a b", "b c"]

    def test_short_text_single_shingle(self, spark):
        got = _one(spark, shingles(F.col("s"), k=5), "a b")
        assert got == ["a b"]


class TestLangDetect:
    def test_english(self, spark):
        assert _one(spark, detect_language(F.col("s")),
                    "the cat and the dog of the house") == "en"

    def test_finnish(self, spark):
        assert _one(spark, detect_language(F.col("s")),
                    "kissa ja koira on talossa ja se ei ole") == "fi"

    def test_unknown(self, spark):
        assert _one(spark, detect_language(F.col("s")), "xyzzy plugh") == "und"


class TestProperties:
    @settings(max_examples=20, deadline=None)
    @given(st.text(alphabet="abc äö\t", max_size=40))
    def test_token_count_nonnegative_and_consistent(self, spark, s):
        n = _one(spark, token_count(F.col("s")).cast("int"), s)
        assert n == len(s.split())

    @settings(max_examples=20, deadline=None)
    @given(st.lists(st.sampled_from(["tok%d" % i for i in range(30)]), min_size=1, max_size=30))
    def test_shingle_count(self, spark, toks):
        s = " ".join(toks)
        got = _one(spark, shingles(F.col("s"), k=3), s)
        assert len(got) == max(len(toks) - 2, 1)


class TestEncodeDecodeAndMaps:
    def test_latin1_decode_roundtrip(self, spark):
        # reference S16: iconv(x, "latin1", "UTF-8") — bytes that were
        # latin-1-decoded get re-encoded and decoded as UTF-8
        df = spark.createDataFrame([("jÃ¤ttipalsami",)], "s string")
        out = df.select(
            F.decode(F.encode(F.col("s"), "ISO-8859-1"), "UTF-8").alias("fixed")
        ).first()
        assert out.fixed == "jättipalsami"

    def test_props_as_map(self, spark):
        from pyspark.sql import types as T

        df = spark.createDataFrame([('{"k": 7, "m": 2}',)], "props string")
        m = F.from_json(F.col("props"), T.MapType(T.StringType(), T.IntegerType()))
        row = df.select(
            F.map_keys(m).alias("keys"),
            F.map_values(m).alias("vals"),
            m.getItem("k").alias("k"),
            F.size(m).alias("n"),
        ).first()
        assert sorted(row.keys) == ["k", "m"]
        assert row.k == 7 and row.n == 2
