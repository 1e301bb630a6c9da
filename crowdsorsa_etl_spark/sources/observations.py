"""Synthetic observation fixtures + dimension tables (FIXTURES.md §A).

The reference's real inputs are gitignored zips (``/root/reference/.gitignore``)
so these deterministic generators reconstruct the *input shapes* from the
column usage cited in FIXTURES.md: 2023/2024 season attribute tables with a
WKB geometry column, the municipality-code dimension (a public-data subset of
Statistics Finland municipality codes, the data behind
``geofi::municipality_key_2023`` used at crowdsorsa-etl-2023.R:52), and the
taxon decode dimension.

Generators are pure functions of (seed, n) — same rows every run.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession

from crowdsorsa_etl_spark.functions.docmodel import TAXA_2023, TAXA_2024
from crowdsorsa_etl_spark.functions.geo import polygons_to_wkb
from crowdsorsa_etl_spark.schemas import (
    MUNICIPALITY_KEY,
    OBSERVATIONS_2023,
    OBSERVATIONS_2024,
    TAXON_KEY,
)

#: Statistics Finland municipality codes (public data; subset).
#: Must contain "20" (Akaa) but not "864" (Toijala, merged into Akaa 2007 —
#: the reason for the reference's recode at crowdsorsa-etl-2023.R:51).
MUNICIPALITIES: list[tuple[str, str]] = [
    ("20", "Akaa"),
    ("49", "Espoo"),
    ("91", "Helsinki"),
    ("92", "Vantaa"),
    ("109", "Hämeenlinna"),
    ("179", "Jyväskylä"),
    ("205", "Kajaani"),
    ("235", "Kauniainen"),
    ("272", "Kokkola"),
    ("297", "Kuopio"),
    ("398", "Lahti"),
    ("405", "Lappeenranta"),
    ("491", "Mikkeli"),
    ("536", "Nokia"),
    ("564", "Oulu"),
    ("604", "Pirkkala"),
    ("609", "Pori"),
    ("638", "Porvoo"),
    ("698", "Rovaniemi"),
    ("734", "Salo"),
    ("743", "Seinäjoki"),
    ("837", "Tampere"),
    ("853", "Turku"),
    ("905", "Vaasa"),
]

def _mangle(taxon: str) -> str:
    """Simulate the double-encoding the 2023 file exhibits (ö→Ã¶, ä→Ã¤)."""
    return taxon.replace("ö", "Ã¶").replace("ä", "Ã¤")


def _square(cx: float, cy: float, half: float) -> list[list[tuple[float, float]]]:
    return [
        [
            (cx - half, cy - half),
            (cx + half, cy - half),
            (cx + half, cy + half),
            (cx - half, cy + half),
            (cx - half, cy - half),
        ]
    ]


def _unclosed_square(cx: float, cy: float, half: float) -> list[list[tuple[float, float]]]:
    ring = _square(cx, cy, half)[0]
    return [ring[:-1]]  # drop the closing point → "invalid" for make_valid


def observations_2023(spark: SparkSession, n: int = 200, seed: int = 7) -> DataFrame:
    rng = random.Random(seed)
    taxa = list(TAXA_2023) + ["tuntematonlaji"]  # includes one unknown → NULL id
    rows = []
    for i in range(n):
        code, _name = MUNICIPALITIES[rng.randrange(len(MUNICIPALITIES))]
        if i % 17 == 0:
            code = "864"  # exercises the recode → "20"
        taxon = taxa[rng.randrange(len(taxa))]
        controlled = rng.random() < 0.4
        # WGS84 squares around Finland; a degenerate zero-area one every 23rd
        lon = 22.0 + rng.random() * 8.0
        lat = 60.0 + rng.random() * 5.0
        half = 0.0 if i % 23 == 0 else 0.0001 + rng.random() * 0.0005
        poly = _square(lon, lat, half) if i % 11 else _unclosed_square(lon, lat, half)
        rows.append(
            (
                f"OBS23-{i:05d}",
                code,
                f"2023-0{rng.randrange(5, 9)}-{rng.randrange(10, 28)}"
                f"T{rng.randrange(6, 20):02d}:{rng.randrange(60):02d}:{rng.randrange(60):02d}",
                _mangle(taxon),
                f"2023-09-{rng.randrange(10, 28)}" if controlled else None,
                polygons_to_wkb([poly]),
                None,
            )
        )
    return spark.createDataFrame(rows, OBSERVATIONS_2023)


def observations_2024(spark: SparkSession, n: int = 200, seed: int = 11) -> DataFrame:
    rng = random.Random(seed)
    taxa = list(TAXA_2024) + ["tuntematonlaji"]
    rows = []
    for i in range(n):
        _code, name = MUNICIPALITIES[rng.randrange(len(MUNICIPALITIES))]
        taxon = taxa[rng.randrange(len(taxa))]
        # every 13th row carries the 2026 year typo (crowdsorsa-etl-2024.R:36)
        year = "2026" if i % 13 == 0 else "2024"
        controlled = rng.random() < 0.4
        # EUREF/TM35FIN planar meters
        x = 200000.0 + rng.random() * 500000.0
        y = 6700000.0 + rng.random() * 800000.0
        half = 1.0 + rng.random() * 40.0
        rows.append(
            (
                f"OBS24-{i:05d}",
                name,
                f"{year}-0{rng.randrange(5, 9)}-{rng.randrange(10, 28)}",
                (f"{year}-09-{rng.randrange(10, 28)}" if controlled else None),
                taxon.capitalize() if i % 3 == 0 else taxon,
                round(rng.choice([1.0, 2.0, 2.35, 3.5, 4.25, 5.0]), 2),
                polygons_to_wkb([_square(x, y, half)]),
                None,
            )
        )
    return spark.createDataFrame(rows, OBSERVATIONS_2024)


def municipality_dim(spark: SparkSession) -> DataFrame:
    """The broadcast dimension replacing geofi::municipality_key_2023."""
    return spark.createDataFrame(MUNICIPALITIES, MUNICIPALITY_KEY)


def taxon_dim(spark: SparkSession) -> DataFrame:
    rows = [(k, v, 2023) for k, v in TAXA_2023.items()] + [
        (k, v, 2024) for k, v in TAXA_2024.items()
    ]
    return spark.createDataFrame(rows, TAXON_KEY)
