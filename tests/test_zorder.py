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
