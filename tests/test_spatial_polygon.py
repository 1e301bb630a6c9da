"""Polygon-polygon grid join: agreement with the brute-force predicate on
synthetic geometries (overlap, touch, containment, hole, disjoint),
single-emission of every pair, and the mega-polygon broadcast routing."""

from __future__ import annotations

from pyspark.sql import functions as F

from crowdsorsa_etl_spark.functions.geo import (
    _intersects_py,
    polygons_to_wkb,
)
from crowdsorsa_etl_spark.operators.spatial import grid_polygon_join


def _square(x0, y0, w, h=None):
    h = w if h is None else h
    ring = [(x0, y0), (x0 + w, y0), (x0 + w, y0 + h), (x0, y0 + h), (x0, y0)]
    return polygons_to_wkb([[ring]])


def _donut(x0, y0, w, hole_margin):
    outer = [(x0, y0), (x0 + w, y0), (x0 + w, y0 + w), (x0, y0 + w), (x0, y0)]
    m = hole_margin
    inner = [
        (x0 + m, y0 + m),
        (x0 + w - m, y0 + m),
        (x0 + w - m, y0 + w - m),
        (x0 + m, y0 + w - m),
        (x0 + m, y0 + m),
    ]
    return polygons_to_wkb([[outer, inner]])


def _cases():
    # left set
    left = {
        "overlap": _square(0, 0, 10),
        "contains": _square(100, 100, 50),
        "donut": _donut(200, 200, 30, 10),
        "lonely": _square(500, 500, 5),
        "touch": _square(300, 0, 10),
    }
    # right set
    right = {
        "overlaps_overlap": _square(5, 5, 10),      # proper overlap
        "inside_contains": _square(120, 120, 5),    # containment, no edges
        "in_donut_hole": _square(212, 212, 6),      # inside the hole → NO
        "across_donut": _square(195, 195, 50),      # crosses ring → YES
        "touches_touch": _square(310, 0, 10),       # shared edge → YES
        "far": _square(900, 900, 3),                # disjoint
    }
    return left, right


def _truth(left, right):
    return {
        (a, b)
        for a, wa in left.items()
        for b, wb in right.items()
        if _intersects_py(wa, wb)
    }


class TestPolygonJoin:
    def _run(self, spark, left, right, **kw):
        ldf = spark.createDataFrame(
            list(left.items()), "a_id string, a_wkb binary"
        )
        rdf = spark.createDataFrame(
            list(right.items()), "b_id string, b_wkb binary"
        )
        rows = grid_polygon_join(ldf, rdf, **kw).collect()
        pairs = [(r.a_id, r.b_id) for r in rows]
        assert len(pairs) == len(set(pairs)), "pair emitted more than once"
        return set(pairs)

    def test_matches_bruteforce_semantics(self, spark):
        left, right = _cases()
        got = self._run(spark, left, right, cell_size=20.0)
        assert got == _truth(left, right)
        # spot-check the interesting semantics held
        assert ("donut", "in_donut_hole") not in got
        assert ("donut", "across_donut") in got
        assert ("touch", "touches_touch") in got
        assert ("contains", "inside_contains") in got

    def test_mega_polygon_branch(self, spark):
        """A polygon spanning thousands of cells routes through the
        broadcast branch; results are identical to the grid-only truth."""
        left, right = _cases()
        left["mega"] = _square(-1000, -1000, 5000)  # covers everything
        truth = _truth(left, right)
        got = self._run(
            spark, left, right, cell_size=20.0, max_cells_per_poly=64
        )
        assert got == truth
        assert {p for p in got if p[0] == "mega"} == {
            ("mega", b) for b in right
        }

    def test_all_branches_agree(self, spark):
        """Forcing every polygon down the mega path (max_cells=0 — envelope
        theta joins only) returns the same pairs as the pure grid path."""
        left, right = _cases()
        grid = self._run(spark, left, right, cell_size=20.0)
        bcast = self._run(
            spark, left, right, cell_size=20.0, max_cells_per_poly=0
        )
        assert grid == bcast == _truth(left, right)
