"""Lockstep tests for functions/portable_hash: every primitive's Spark
column form and DuckDB SQL fragment must produce identical values on the
same inputs — including NULL-skipping semantics and the int64 overflow
edges the fragments are engineered around. These are the unit-level gates
under the LSH/IVF oracle queries (lsh_oracles.py)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from crowdsorsa_etl_spark.functions.portable_hash import (
    CW_PRIME,
    combine60_spark,
    combine60_sql,
    combine_cw_spark,
    combine_cw_sql,
    cw_hash_spark,
    cw_hash_sql,
    h64_spark,
    h64_sql,
    hex60_spark,
    hex60_sql,
)

WORDS = ["kettu", "karhu", "", "Ä löysin sen!", "a b c", "0", "repo"]


def _duck(sql: str):
    return [r[0] for r in duckdb.connect().execute(sql).fetchall()]


class TestWordPrimitives:
    def test_hex60_lockstep(self, spark):
        df = spark.createDataFrame([(w,) for w in WORDS], "t string")
        got = [r.h for r in df.select(hex60_spark(F.col("t")).alias("h")).collect()]
        vals = ", ".join(f"('{w}')" for w in WORDS)
        want = _duck(
            f"SELECT {hex60_sql('t')} FROM (VALUES {vals}) AS v(t)"
        )
        assert got == want
        assert all(0 <= h < (1 << 60) for h in got)  # fits signed int64

    def test_h64_lockstep_covers_negative_words(self, spark):
        df = spark.createDataFrame([(w,) for w in WORDS], "t string")
        got = [r.h for r in df.select(h64_spark(F.col("t")).alias("h")).collect()]
        vals = ", ".join(f"('{w}')" for w in WORDS)
        want = _duck(f"SELECT {h64_sql('t')} FROM (VALUES {vals}) AS v(t)")
        assert got == want
        # the full-64-bit word must exercise the sign bit somewhere in the
        # fixture vocabulary, else the signed-overflow-safe combine is
        # untested
        assert any(h < 0 for h in got)

    @pytest.mark.parametrize("i", [0, 1, 7, 15])
    def test_cw_family_lockstep(self, spark, i):
        xs = [0, 1, CW_PRIME - 1, CW_PRIME, (1 << 60) - 1]
        df = spark.createDataFrame([(x,) for x in xs], "x long")
        got = [
            r.h for r in df.select(cw_hash_spark(F.col("x"), i).alias("h")).collect()
        ]
        vals = ", ".join(f"({x})" for x in xs)
        want = _duck(
            f"SELECT {cw_hash_sql('x', i)} FROM (VALUES {vals}) AS v(x)"
        )
        assert got == want
        assert all(0 <= h < CW_PRIME for h in got)


class TestCombines:
    def test_combine_cw_lockstep_with_null_skipping(self, spark):
        rows = [
            (5, 7, 11),
            (5, None, 11),  # NULL word skipped, not zeroed
            (None, None, None),
            ((1 << 60) - 1, (1 << 60) - 1, (1 << 60) - 1),  # overflow edge
        ]
        df = spark.createDataFrame(rows, "a long, b long, c long")
        for seed in (0, 3):
            got = [
                r.h
                for r in df.select(
                    combine_cw_spark(
                        F.col("a"), F.col("b"), F.col("c"), seed=seed
                    ).alias("h")
                ).collect()
            ]
            vals = ", ".join(
                "({}, {}, {})".format(
                    *("NULL" if v is None else v for v in row)
                )
                for row in rows
            )
            want = _duck(
                f"SELECT {combine_cw_sql('a', 'b', 'c', seed=seed)}"
                f" FROM (VALUES {vals}) AS v(a, b, c)"
            )
            assert got == want

    def test_combine_cw_null_skip_equals_shorter_combine(self, spark):
        """Skipping a NULL must equal combining the non-NULL prefix — the
        trailing-sub-shingle semantics minhash relies on."""
        df = spark.createDataFrame([(5, 7)], "a long, b long")
        with_null = df.select(
            combine_cw_spark(F.col("a"), F.col("b"), F.lit(None).cast("long")).alias(
                "h"
            )
        ).first().h
        without = df.select(
            combine_cw_spark(F.col("a"), F.col("b")).alias("h")
        ).first().h
        assert with_null == without

    def test_combine_cw_seeds_decorrelate(self, spark):
        df = spark.createDataFrame([(5, 7)], "a long, b long")
        hs = {
            df.select(
                combine_cw_spark(F.col("a"), F.col("b"), seed=s).alias("h")
            ).first().h
            for s in range(4)
        }
        assert len(hs) == 4

    def test_combine60_lockstep(self, spark):
        df = spark.createDataFrame([(5, None), (5, 7)], "a long, b long")
        got = [
            r.h
            for r in df.select(
                combine60_spark(F.col("a"), F.col("b"), seed="s").alias("h")
            ).collect()
        ]
        want = _duck(
            f"SELECT {combine60_sql('a', 'b', seed='s')}"
            " FROM (VALUES (5, NULL), (5, 7)) AS v(a, b)"
        )
        assert got == want
