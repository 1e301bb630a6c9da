"""FinBIF "laji-etl" nested-document assembly as one columnar projection.

The reference builds one nested R list per row inside a for-loop
(crowdsorsa-etl-2023.R:120-179, crowdsorsa-etl-2024.R:87-147). Every field is
a pure function of the row, so the whole loop body collapses into a single
``F.struct`` expression — one narrow (shuffle-free) stage that whole-stage
codegen compiles end to end; it scales linearly with partitions.

Null/omission semantics (SURVEY.md §2.3 traps):
* unknown taxon → NULL ``reportedTaxonId`` dropped from JSON (trap 1),
* ``facts`` omitted when area < 1 m² (2023 only; trap 2),
* ``sourceTags`` is ``[]`` (kept) when no control date, while ``notes``
  is NULL (dropped) — empty-array vs null distinction (trap 3),
* ``eventDate.begin == eventDate.end`` (trap 9),
* hour/minute fields only in the 2023 document shape (trap 7).

``to_json(..., ignoreNullFields=true)`` reproduces jsonlite's
absent-key behavior exactly: NULL struct fields disappear, empty arrays stay.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

AREA_FACT_URI = "http://tun.fi/MY.areaInSquareMeters"

#: taxon → tun.fi URI decode tables (crowdsorsa-etl-2023.R:96-104,
#: crowdsorsa-etl-2024.R:60-71). No default → NULL on miss.
TAXA_2023: dict[str, str] = {
    "jättipalsami": "http://tun.fi/MX.39158",
    "lupiini": "http://tun.fi/MX.38947",
    "kurtturuusu": "http://tun.fi/MX.38815",
    "jättiputki": "http://tun.fi/MX.41695",
    "japanintatar": "http://tun.fi/MX.38240",
    "karhunköynnös": "http://tun.fi/MX.5001859",
}

TAXA_2024: dict[str, str] = {
    "japanintatar": "http://tun.fi/MX.38240",
    "jättipalsami": "http://tun.fi/MX.39158",
    "jättiputki": "http://tun.fi/MX.41695",
    "jättitatar": "http://tun.fi/MX.38241",
    "lupiini": "http://tun.fi/MX.38947",
    "kanadanpiisku": "http://tun.fi/MX.39730",
    "kurtturuusu": "http://tun.fi/MX.38815",
    "terttuselja": "http://tun.fi/MX.39336",
    "viitapihlaja-angervo": "http://tun.fi/MX.38786",
}


def decode_map(mapping: dict[str, str]) -> Column:
    """Literal lookup map. Map-miss yields NULL (matches R ``switch`` with no
    default). For tiny dims this constant-folds inside codegen — cheaper than
    any join; bigger dims should use a broadcast join instead."""
    pairs: list[Column] = []
    for k, v in mapping.items():
        pairs.extend([F.lit(k), F.lit(v)])
    return F.create_map(*pairs)


def taxon_id_col(taxon: Column, season: int) -> Column:
    mapping = TAXA_2023 if season == 2023 else TAXA_2024
    return decode_map(mapping)[taxon]


def tun_fi(*parts: Column | str) -> Column:
    """``sprintf("http://tun.fi/%s/%s", ...)`` equivalent."""
    cols = [F.lit(p) if isinstance(p, str) else p for p in parts]
    return F.concat_ws("/", F.lit("http://tun.fi"), *cols)


def source_tags(control_date: Column) -> Column:
    """NULL control date → empty array (NOT null); else single tag.
    (crowdsorsa-etl-2023.R:106-116)"""
    return F.when(
        control_date.isNull(), F.array().cast("array<string>")
    ).otherwise(F.array(F.lit("INVASIVE_PARTIAL")))


def control_notes(control_date: Column) -> Column:
    """``"Controlled: <date>"`` only when a control date exists; NULL (→
    dropped key) otherwise. (crowdsorsa-etl-2023.R:118,135-139)"""
    return F.when(
        control_date.isNotNull(), F.concat(F.lit("Controlled: "), control_date)
    )


def area_facts(area: Column) -> Column:
    """The area fact array: double/int/string renderings of the *same
    already-ceiling'ed* value (crowdsorsa-etl-2023.R:65-72, trap 4)."""
    return F.array(
        F.struct(
            area.cast("double").alias("decimalValue"),
            F.lit(AREA_FACT_URI).alias("fact"),
            area.cast("int").alias("integerValue"),
            area.cast("bigint").cast("string").alias("value"),
        )
    )


def abundance_string(tiheys: Column) -> Column:
    """R ``format(x, nsmall = 1)``: at least one decimal, keep extras.
    Spark's double→string cast does exactly this (2 → "2.0", 2.35 → "2.35")."""
    return tiheys.cast("double").cast("string")


def build_document(
    *,
    obs_id: Column,
    municipality: Column,
    event_date: Column,
    taxon: Column,
    taxon_id: Column,
    control_date: Column,
    geometry_geojson: Column,
    crs_label: str,
    source_id: str,
    collection_id: str,
    area: Column | None = None,
    facts_min_area: float | None = None,
    hour: Column | None = None,
    minute: Column | None = None,
    abundance: Column | None = None,
) -> Column:
    """Assemble the full laji-etl document struct for one observation row.

    2023 shape: pass ``hour``/``minute`` and ``facts_min_area=1.0``.
    2024 shape: pass ``abundance`` (tiheys) and leave hour/minute None.
    """
    doc_id = tun_fi(collection_id, obs_id)

    facts = None
    if area is not None:
        facts = area_facts(area)
        if facts_min_area is not None:
            # facts key deleted when area < threshold (2023.R:175-179)
            facts = F.when(area >= F.lit(facts_min_area), facts)

    unit_fields: list[Column] = [
        F.concat(doc_id, F.lit("_U")).alias("unitId"),
        taxon.alias("taxonVerbatim"),
        taxon_id.alias("reportedTaxonId"),
        source_tags(control_date).alias("sourceTags"),
    ]
    if abundance is not None:
        unit_fields.append(abundance_string(abundance).alias("abundanceString"))
        unit_fields.append(F.lit("RELATIVE_DENSITY").alias("abundanceUnit"))
    if facts is not None:
        unit_fields.append(facts.alias("facts"))

    gathering_fields: list[Column] = [
        F.concat(doc_id, F.lit("_G")).alias("gatheringId"),
        F.struct(
            event_date.alias("begin"), event_date.alias("end")
        ).alias("eventDate"),
    ]
    if hour is not None:
        gathering_fields += [hour.alias("hourBegin"), hour.alias("hourEnd")]
    if minute is not None:
        gathering_fields += [minute.alias("minuteBegin"), minute.alias("minuteEnd")]
    gathering_fields += [
        municipality.alias("municipality"),
        F.struct(
            F.lit("FeatureCollection").alias("type"),
            F.lit(crs_label).alias("crs"),
            F.array(
                F.struct(
                    F.lit("Feature").alias("type"),
                    geometry_geojson.alias("geometry"),
                )
            ).alias("features"),
        ).alias("geo"),
        F.array(F.struct(*unit_fields)).alias("units"),
    ]

    return F.struct(
        F.lit("laji-etl").alias("schema"),
        tun_fi(source_id).alias("sourceId"),
        tun_fi(collection_id).alias("collectionId"),
        doc_id.alias("documentId"),
        F.struct(
            F.lit("PUBLIC").alias("concealment"),
            F.array(
                obs_id, F.concat(F.lit("crowdsorsa-"), municipality)
            ).alias("keywords"),
            control_notes(control_date).alias("notes"),
            F.array(F.struct(*gathering_fields)).alias("gatherings"),
        ).alias("publicDocument"),
    )


def doc_to_json(doc: Column) -> Column:
    """Serialize with jsonlite-compatible key omission (drop NULLs, keep
    empty arrays — traps 1 & 3)."""
    return F.to_json(doc, {"ignoreNullFields": "true"})
