"""Distributed spatial join: point-in-polygon via grid-cell bucketing.

The reference's domain is municipality-polygon ETL (crowdsorsa-etl-2023.R
geometry handling); the engine-general operation a cluster needs on top of
that is the SPATIAL JOIN — "which polygon contains each point" — at fact
scale. The classic all-pairs formulation is a cartesian product; the
scalable plan is the grid-file approach every distributed geo engine
(Sedona, PostGIS ST_Intersects + GiST, BigQuery GIS) uses:

1. each polygon explodes to the grid cells its ENVELOPE covers (bbox only —
   cheap, few cells per survey-scale polygon),
2. each point maps to exactly ONE cell (floor division),
3. an equi-join on the cell key produces candidates — a plain hash shuffle
   join, no geometry in the join condition,
4. an exact even-odd ray-cast verify (Arrow-batched pandas UDF) keeps true
   containments.

Sound and complete: a containing polygon's envelope always covers the
point's cell, so step 3 never loses a true pair (the DuckDB oracle for the
registered query checks exactly this — it computes the ALL-PAIRS ground
truth and the hash gate proves the bucketed plan matches it).

Scale: cells-per-polygon is bounded by envelope size / cell_size (pick
cell_size ≈ median polygon extent ×4; skewed mega-polygons can be handled
by splitting, not needed for survey squares). Shuffle volume is
|points| + Σ cells(polygon) rows — linear, never |points|×|polygons|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crowdsorsa_etl_spark.functions.geo import st_contains_point, st_envelope


def grid_spatial_join(
    points: DataFrame,
    polygons: DataFrame,
    *,
    cell_size: float,
    point_id: str = "point_id",
    x_col: str = "x",
    y_col: str = "y",
    poly_id: str = "poly_id",
    wkb_col: str = "geometry_wkb",
) -> DataFrame:
    """(point_id, poly_id) for every point strictly inside a polygon."""
    env = polygons.select(
        F.col(poly_id), F.col(wkb_col), st_envelope(F.col(wkb_col)).alias("e")
    )
    cells = env.select(
        poly_id,
        wkb_col,
        F.explode(
            F.sequence(
                F.floor(F.col("e.xmin") / cell_size).cast("long"),
                F.floor(F.col("e.xmax") / cell_size).cast("long"),
            )
        ).alias("cx"),
        F.col("e.ymin").alias("_ymin"),
        F.col("e.ymax").alias("_ymax"),
    ).select(
        poly_id,
        wkb_col,
        "cx",
        F.explode(
            F.sequence(
                F.floor(F.col("_ymin") / cell_size).cast("long"),
                F.floor(F.col("_ymax") / cell_size).cast("long"),
            )
        ).alias("cy"),
    )
    pts = points.select(
        F.col(point_id),
        F.col(x_col).alias("_px"),
        F.col(y_col).alias("_py"),
        F.floor(F.col(x_col) / cell_size).cast("long").alias("cx"),
        F.floor(F.col(y_col) / cell_size).cast("long").alias("cy"),
    )
    cand = pts.join(cells, ["cx", "cy"])
    # no dedup needed: a point lives in exactly ONE cell, and a polygon
    # contributes that cell at most once, so each (point, polygon) pair
    # surfaces at most once
    return cand.filter(
        st_contains_point(F.col(wkb_col), F.col("_px"), F.col("_py"))
    ).select(point_id, poly_id)
