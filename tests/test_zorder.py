"""Tests for operators/zorder.py — Morton interleave and layout locality."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from crowdsorsa_etl_spark.operators.zorder import z_value, zorder_write


class TestZValue:
    def test_known_interleave(self, spark):
        # x=3 (0b011) fills even bits, y=5 (0b101) odd bits:
        # bit0=x0=1, bit1=y0=1, bit2=x1=1, bit3=y1=0, bit4=x2=0, bit5=y2=1
        # -> 0b100111 = 39
        df = spark.createDataFrame([(3, 5)], "x int, y int")
        assert df.select(z_value(F.col("x"), F.col("y")).alias("z")).first().z == 39

    def test_monotone_in_each_dim_locally(self, spark):
        # within one dim (other fixed), z is strictly increasing
        df = spark.createDataFrame([(x, 7) for x in range(16)], "x int, y int")
        zs = [r.z for r in df.select("x", z_value(F.col("x"), F.col("y")).alias("z"))
              .orderBy("x").collect()]
        assert zs == sorted(zs) and len(set(zs)) == 16


class TestZOrderLayout:
    def test_files_are_compact_in_both_dims(self, spark, tmp_path):
        """Z-sorted files must cover narrow ranges of BOTH keys — that
        range-narrowness is exactly what makes parquet min/max stats prune
        predicates on either dimension. A single-key sort would leave the
        other dimension's per-file spread at ~the global spread."""
        n, side = 4096, 64
        df = spark.range(n).select(
            (F.col("id") % side).cast("int").alias("x"),
            (F.col("id") / side).cast("int").alias("y"),
            F.col("id").alias("payload"),
        )
        path = str(tmp_path / "zed")
        zorder_write(df, path, "x", "y", bits=8, num_files=16)

        spreads_x, spreads_y = [], []
        for f in glob.glob(path + "/*.parquet"):
            t = pq.read_table(f, columns=["x", "y"])
            xs, ys = t.column("x").to_pylist(), t.column("y").to_pylist()
            if not xs:
                continue
            spreads_x.append(max(xs) - min(xs))
            spreads_y.append(max(ys) - min(ys))
        # 16 files over a 64x64 grid: perfect Z tiling gives per-file spread
        # 16/64 of global in each dim; allow slack for range-boundary files
        assert sum(spreads_x) / len(spreads_x) < 0.5 * (side - 1)
        assert sum(spreads_y) / len(spreads_y) < 0.5 * (side - 1)


class TestZValueNary:
    def test_three_key_interleave_known_value(self, spark):
        from crowdsorsa_etl_spark.operators.zorder import z_value_n

        # x=1 (bit0), y=1 (bit0), w=1 (bit0) with n=3: positions 0,1,2 -> 0b111
        df = spark.createDataFrame([(1, 1, 1)], "x int, y int, w int")
        z = df.select(
            z_value_n([F.col("x"), F.col("y"), F.col("w")], bits=4).alias("z")
        ).first().z
        assert z == 0b111
        # x=2 -> bit1 of x at position 1*3+0=3; y=0, w=1 -> bit 2
        df2 = spark.createDataFrame([(2, 0, 1)], "x int, y int, w int")
        z2 = df2.select(
            z_value_n([F.col("x"), F.col("y"), F.col("w")], bits=4).alias("z")
        ).first().z
        assert z2 == (1 << 3) | (1 << 2)

    def test_two_key_wrapper_unchanged(self, spark):
        # the 2-ary wrapper must reproduce the classic Morton value
        df = spark.createDataFrame([(3, 5)], "x int, y int")
        assert df.select(z_value(F.col("x"), F.col("y")).alias("z")).first().z == 39

    def test_bit_budget_guard(self):
        from crowdsorsa_etl_spark.operators.zorder import _bits_for

        assert _bits_for(3, None) == 16
        assert _bits_for(4, None) == 15
        import pytest as _pytest

        with _pytest.raises(ValueError):
            _bits_for(4, 16)  # 64 bits overflows signed bigint

    def test_three_key_layout_compact_in_all_dims(self, spark, tmp_path):
        """16 files over an 8x8x8 grid: Z-sorted files must cover narrow
        ranges of ALL THREE keys; a single-key sort leaves the other two
        dimensions' per-file spread at ~the global spread."""
        side = 16
        n = side**3
        df = spark.range(n).select(
            (F.col("id") % side).cast("int").alias("x"),
            ((F.col("id") / side) % side).cast("int").alias("y"),
            (F.col("id") / (side * side)).cast("int").alias("w"),
            F.col("id").alias("payload"),
        )
        path = str(tmp_path / "zed3")
        zorder_write(df, path, "x", "y", "w", bits=4, num_files=16)

        import glob as _glob

        import pyarrow.parquet as _pq

        spreads = {"x": [], "y": [], "w": []}
        for f in _glob.glob(path + "/*.parquet"):
            t = _pq.read_table(f, columns=["x", "y", "w"])
            for c in spreads:
                vals = t.column(c).to_pylist()
                if vals:
                    spreads[c].append(max(vals) - min(vals))
        for c, ss in spreads.items():
            assert sum(ss) / len(ss) < 0.5 * (side - 1), c
