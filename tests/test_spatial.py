"""Grid-bucketed point-in-polygon join vs brute-force ray cast."""

from __future__ import annotations

from pyspark.sql import functions as F

from crowdsorsa_etl_spark.functions.geo import (
    _contains_py,
    polygons_to_wkb,
)
from crowdsorsa_etl_spark.operators.spatial import grid_spatial_join


def _square(cx, cy, half):
    return [
        [
            (cx - half, cy - half),
            (cx + half, cy - half),
            (cx + half, cy + half),
            (cx - half, cy + half),
            (cx - half, cy - half),
        ]
    ]


class TestGridSpatialJoin:
    def _fixtures(self, spark):
        # polygons straddling cell boundaries on purpose (cell_size = 10)
        polys = [
            ("P1", polygons_to_wkb([_square(5.0, 5.0, 3.0)])),       # 1 cell
            ("P2", polygons_to_wkb([_square(10.0, 10.0, 4.0)])),     # 4 cells
            ("P3", polygons_to_wkb([_square(25.0, 5.0, 12.0)])),     # wide
        ]
        points = [
            ("in1", 5.0, 5.0),
            ("in2", 9.0, 9.0),    # inside P2 (and near P1's bbox, not inside)
            ("in3", 30.0, 2.0),   # inside P3
            ("both", 13.5, 8.0),  # inside P2 (x∈[6,14]) AND P3 (x∈[13,37])
            ("out1", 50.0, 50.0),
            ("edgecell", 19.9, 5.0),  # same cell as parts of P3, inside it
        ]
        pdf = spark.createDataFrame(points, "point_id string, x double, y double")
        gdf = spark.createDataFrame(polys, "poly_id string, geometry_wkb binary")
        return pdf, gdf, points, polys

    def test_matches_brute_force(self, spark):
        pdf, gdf, points, polys = self._fixtures(spark)
        got = {
            (r.point_id, r.poly_id)
            for r in grid_spatial_join(pdf, gdf, cell_size=10.0).collect()
        }
        want = {
            (pid, gid)
            for pid, x, y in points
            for gid, wkb in polys
            if _contains_py(wkb, x, y)
        }
        assert got == want
        assert ("both", "P2") in got and ("both", "P3") in got
        assert not any(p == "out1" for p, _ in got)

    def test_multi_cell_polygon_no_duplicates(self, spark):
        pdf, gdf, *_ = self._fixtures(spark)
        rows = grid_spatial_join(pdf, gdf, cell_size=2.0).collect()
        pairs = [(r.point_id, r.poly_id) for r in rows]
        assert len(pairs) == len(set(pairs))

    def test_hash_join_not_cartesian(self, spark):
        pdf, gdf, *_ = self._fixtures(spark)
        out = grid_spatial_join(pdf, gdf, cell_size=10.0)
        plan = out._sc._jvm.PythonSQLUtils.explainString(
            out._jdf.queryExecution(), "simple"
        )
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoop" not in plan
