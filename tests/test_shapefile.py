"""Zipped-shapefile connector: roundtrip through writer → reader → pipeline."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from crowdsorsa_etl_spark.functions.geo import _parse_wkb
from crowdsorsa_etl_spark.pipelines.crowdsorsa import documents_2024
from crowdsorsa_etl_spark.sources.shapefile import (
    read_shapefile_zip,
    write_shapefile_zip,
)

SQUARE = [[(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0), (0.0, 0.0)]]
FIELDS = [
    ("tunniste", "C", 20, 0),
    ("kunta", "C", 20, 0),
    ("havaittu", "C", 10, 0),
    ("torjuttu", "C", 10, 0),
    ("laji", "C", 30, 0),
    ("tiheys", "N", 8, 2),
]
ROWS = [
    ["OBS-1", "Espoo", "2024-06-01", None, "Lupiini", 2.0],
    ["OBS-2", "Helsinki", "2026-07-02", "2024-08-01", "jättiputki", 3.5],
]


@pytest.fixture()
def shp_zip(tmp_path):
    path = str(tmp_path / "data2024.zip")
    write_shapefile_zip(
        path,
        field_specs=FIELDS,
        rows=ROWS,
        geometries=[[SQUARE], [SQUARE]],
    )
    return path


class TestShapefileReader:
    def test_roundtrip_attributes_and_geometry(self, spark, shp_zip):
        df = read_shapefile_zip(spark, shp_zip)
        assert df.columns == [
            "tunniste", "kunta", "havaittu", "torjuttu", "laji", "tiheys",
            "geometry_wkb",
        ]
        rows = {r.tunniste: r for r in df.collect()}
        assert rows["OBS-1"].kunta == "Espoo"
        assert rows["OBS-1"].torjuttu is None
        assert rows["OBS-2"].tiheys == 3.5
        # geometry: parse back the WKB and verify the ring
        polys = _parse_wkb(bytes(rows["OBS-1"].geometry_wkb))
        assert len(polys) == 1 and len(polys[0][0]) == 5

    def test_feeds_2024_pipeline(self, spark, shp_zip):
        obs = read_shapefile_zip(spark, shp_zip).withColumn(
            "area_m2", F.lit(None).cast("double")
        )
        out = documents_2024(obs)
        docs = {r.obs_id: json.loads(r.document_json) for r in out.collect()}
        g2 = docs["OBS-2"]["publicDocument"]["gatherings"][0]
        assert g2["eventDate"]["begin"] == "2024-07-02"  # typo repaired
        u2 = g2["units"][0]
        assert u2["reportedTaxonId"] == "http://tun.fi/MX.41695"  # jättiputki
        assert u2["facts"][0]["integerValue"] == 100  # 10x10 planar square
