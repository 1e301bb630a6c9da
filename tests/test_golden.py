"""Frozen golden-document fixtures (FIXTURES.md §A5): the pipelines must
reproduce tests/golden/*.json byte-for-byte (structure-for-structure) for a
fixed set of hand-picked inputs covering SURVEY §2.3 traps."""

from __future__ import annotations

import json
import os

import pytest

from crowdsorsa_etl_spark.functions.geo import polygons_to_wkb
from crowdsorsa_etl_spark.pipelines.crowdsorsa import documents_2023, documents_2024
from crowdsorsa_etl_spark.schemas import OBSERVATIONS_2023, OBSERVATIONS_2024
from crowdsorsa_etl_spark.sources.observations import municipality_dim

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")

SQ_WGS = polygons_to_wkb(
    [[[(25.0, 60.0), (25.001, 60.0), (25.001, 60.001), (25.0, 60.001), (25.0, 60.0)]]]
)
PT_WGS = polygons_to_wkb([[[(25.0, 60.0)] * 4]])
SQ_EU = polygons_to_wkb(
    [[[(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0), (0.0, 0.0)]]]
)

ROWS_2023 = [
    ("G23-001", "91", "2023-06-15T13:45:30", "jÃ¤ttipalsami", None, SQ_WGS, None),
    ("G23-002", "864", "2023-07-01T08:05:00", "lupiini", "2023-09-12", SQ_WGS, None),
    ("G23-003", "49", "2023-08-20T17:30:59", "karhunkÃ¶ynnÃ¶s", None, SQ_WGS, None),
    ("G23-004", "837", "2023-05-11T06:00:00", "outolaji", None, SQ_WGS, None),
    ("G23-005", "853", "2023-06-02T12:15:45", "kurtturuusu", None, PT_WGS, None),
]
ROWS_2024 = [
    ("G24-001", "Espoo", "2024-07-01", None, "Lupiini", 2.0, SQ_EU, None),
    ("G24-002", "Helsinki", "2026-06-10", "2026-09-03", "jättiputki", 2.35, SQ_EU, None),
    ("G24-003", "Tampere", "2024-08-14", None, "VIITAPIHLAJA-ANGERVO", 4.5, SQ_EU, None),
    ("G24-004", "Turku", "2024-05-30", None, "mysteerikasvi", 1.0, SQ_EU, None),
]


def _load(name: str) -> dict:
    with open(os.path.join(GOLDEN_DIR, name), encoding="utf-8") as fh:
        return json.load(fh)


class TestGoldenDocuments:
    def test_2023_matches_golden(self, spark):
        obs = spark.createDataFrame(ROWS_2023, OBSERVATIONS_2023)
        got = {
            r.obs_id: json.loads(r.document_json)
            for r in documents_2023(obs, municipality_dim(spark)).collect()
        }
        assert got == _load("documents_2023.json")

    def test_2024_matches_golden(self, spark):
        obs = spark.createDataFrame(ROWS_2024, OBSERVATIONS_2024)
        got = {
            r.obs_id: json.loads(r.document_json)
            for r in documents_2024(obs).collect()
        }
        assert got == _load("documents_2024.json")
