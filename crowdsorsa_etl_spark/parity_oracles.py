"""DuckDB oracles for the season-parity pipelines (crowdsorsa 2023/2024).

The two season pipelines are the literal reference parity
(crowdsorsa-etl-2023.R:46-228, crowdsorsa-etl-2024.R:42-190). Through round 6
their correctness rested on golden-JSON tests; these oracles upgrade the
proof to an INDEPENDENT ENGINE replaying the full document build — including
the geometry path — and hash-comparing the emitted JSON byte-for-byte:

* the synthetic observation fixtures are persisted ONCE to parquet (pyarrow,
  single file, content-addressed path) so both engines read identical bytes;
* the WKB geometry column is parsed in SQL — hex() the BLOB, reassemble the
  little-endian IEEE-754 doubles from byte-reversed hex chunks, exact
  (sign · (2^52 + mantissa) · 2^(e-1075));
* ring repair (close an unclosed ring), spherical-excess geodesic area
  (2023) and shoelace planar area (2024) are replayed with the identical
  operation order as functions/geo.py, so every double matches bit-for-bit
  (same libm on this host; verified value-exact over the whole fixture);
* the JSON document string is assembled field-by-field in Spark's to_json
  struct order with ignoreNullFields semantics (conditional key concat).

Scope: the SQL geometry replay handles the fixture's shapes — single-polygon
single-ring WKB (possibly unclosed, possibly degenerate) — which is exactly
what the generators emit; multi-ring/bowtie repair stays covered by
tests/test_geo.py unit gates. If the WKB held >1 polygon or ring the oracle
poisons the row to NULL (a visible mismatch, never a silent pass).

Rendering parity notes (empirically verified over every double the fixtures
contain): Jackson (Java 17) and DuckDB both print the shortest round-trip
decimal for these magnitudes; neither escapes non-ASCII or '/' in JSON
strings, and the fixture strings contain no characters needing escapes.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile

from crowdsorsa_etl_spark.functions.docmodel import (
    AREA_FACT_URI,
    TAXA_2023,
    TAXA_2024,
)
from crowdsorsa_etl_spark.functions.text import MOJIBAKE_MAP

# ---------------------------------------------------------------------------
# fixture persistence (pyarrow — no Spark session needed, deterministic file)
# ---------------------------------------------------------------------------


def _fixture_fingerprint() -> str:
    """Content-address the fixture dir on the SOURCES the fixture bytes
    depend on — the row generators (observations.py) AND the WKB encoder
    (functions/geo.py) — so editing either invalidates the cache instead of
    silently serving stale geometry bytes."""
    import crowdsorsa_etl_spark.functions.geo as geo_mod
    import crowdsorsa_etl_spark.sources.observations as obs_mod

    h = hashlib.md5()
    for mod in (obs_mod, geo_mod):
        with open(mod.__file__, "rb") as fh:
            h.update(fh.read())
    return h.hexdigest()[:12]


def observation_fixture_dir() -> str:
    return os.path.join(
        tempfile.gettempdir(), f"crowdsorsa_obsfix_{_fixture_fingerprint()}"
    )


def ensure_observation_fixtures() -> str:
    """Write observations_2023/2024 + municipality_key as single parquet
    files (idempotent, atomic rename; concurrent callers tolerate the race).
    Returns the fixture dir both engines read from."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from crowdsorsa_etl_spark.sources.observations import (
        MUNICIPALITIES,
        observation_rows_2023,
        observation_rows_2024,
    )

    d = observation_fixture_dir()
    if os.path.isdir(d):
        return d
    tmp = f"{d}.tmp-{os.getpid()}"
    os.makedirs(tmp, exist_ok=True)

    def write(name: str, cols: dict[str, tuple[list, pa.DataType]]) -> None:
        arrays = {k: pa.array(v, type=t) for k, (v, t) in cols.items()}
        pq.write_table(pa.table(arrays), os.path.join(tmp, f"{name}.parquet"))

    r23 = observation_rows_2023()
    write(
        "observations_2023",
        {
            "id": ([r[0] for r in r23], pa.string()),
            "kuntakoodi": ([r[1] for r in r23], pa.string()),
            "havaittu": ([r[2] for r in r23], pa.string()),
            "laji": ([r[3] for r in r23], pa.string()),
            "torjunta": ([r[4] for r in r23], pa.string()),
            "geometry_wkb": ([r[5] for r in r23], pa.binary()),
            "area_m2": ([r[6] for r in r23], pa.float64()),
        },
    )
    r24 = observation_rows_2024()
    write(
        "observations_2024",
        {
            "tunniste": ([r[0] for r in r24], pa.string()),
            "kunta": ([r[1] for r in r24], pa.string()),
            "havaittu": ([r[2] for r in r24], pa.string()),
            "torjuttu": ([r[3] for r in r24], pa.string()),
            "laji": ([r[4] for r in r24], pa.string()),
            "tiheys": ([r[5] for r in r24], pa.float64()),
            "geometry_wkb": ([r[6] for r in r24], pa.binary()),
            "area_m2": ([r[7] for r in r24], pa.float64()),
        },
    )
    write(
        "municipality_key",
        {
            "kunta": ([m[0] for m in MUNICIPALITIES], pa.string()),
            "municipality_name_fi": ([m[1] for m in MUNICIPALITIES], pa.string()),
        },
    )
    try:
        os.replace(tmp, d)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)  # lost the race — other's copy wins
        if not os.path.isdir(d):
            raise
    return d


def _fixture_dir_for_sql() -> str:
    """Fixture dir for SQL generation, which runs at registry IMPORT time:
    materialize eagerly when possible (so the oracle works even if the
    driver runs it before the Spark query), but never let a broken temp
    dir / missing pyarrow turn into an import failure of the whole query
    registry — the deterministic path alone keeps the SQL valid, and the
    query functions re-ensure the files before any oracle can run."""
    try:
        return ensure_observation_fixtures()
    except Exception:  # noqa: BLE001 — degraded: path-only, files written later
        return observation_fixture_dir()


# ---------------------------------------------------------------------------
# SQL fragment generators — WKB byte decode and geometry math
# ---------------------------------------------------------------------------

#: math.radians' multiplier (Python precomputes pi/180 as this double);
#: written literally so the SQL multiplies by the identical constant.
_DEG2RAD = "0.017453292519943295"
#: mean Earth radius used by functions/geo.py (s2 parity)
_EARTH_R = "6371010.0"


def _f754(chunk: str) -> str:
    """SQL decoding a 16-hex-char LITTLE-ENDIAN chunk as an IEEE-754 double.

    Reverse the byte pairs to big-endian, parse as UBIGINT, then rebuild the
    value exactly: (2^52 + mantissa) is an exact double (< 2^53) and scaling
    by a power of two is lossless, so the result is bit-identical to the
    original. Subnormals (e = 0) use mantissa · 2^-1074. ``chunk`` must be a
    side-effect-free SQL expression (it is repeated)."""
    be = "||".join(f"substr({chunk},{1 + 2 * (7 - i)},2)" for i in range(8))
    u = f"(('0x'||{be})::UBIGINT)"
    e = f"CAST(({u}>>52)&2047 AS BIGINT)"
    m = f"({u}&4503599627370495)"
    return (
        f"((CASE WHEN {u}>=9223372036854775808 THEN -1.0 ELSE 1.0 END)"
        f"*(CASE WHEN {e}=0 THEN CAST({m} AS DOUBLE)*POW(2.0,-1074)"
        f" ELSE CAST(4503599627370496+{m} AS DOUBLE)*POW(2.0,{e}-1075) END))"
    )


def _u32le(chunk: str) -> str:
    """SQL decoding an 8-hex-char little-endian chunk as an unsigned int32."""
    be = "||".join(f"substr({chunk},{1 + 2 * (3 - i)},2)" for i in range(4))
    return f"(('0x'||{be})::UBIGINT)"


# WKB layout written by functions/geo.polygons_to_wkb (all little-endian):
# byte 0: order=01 | 1-4: type=6 | 5-8: n_polys | 9: order | 10-13: type=3
# | 14-17: n_rings | 18-21: n_pts | 22+16k: x_k | 30+16k: y_k.
# hex() position of byte B is 2·B+1 (1-based).
_NPOLYS = _u32le("substr(hx,11,8)")
_NRINGS = _u32le("substr(hx,29,8)")
_NPTS = _u32le("substr(hx,37,8)")
_XS = f"list_transform(range(0, CAST(npts AS BIGINT)), k -> {_f754('substr(hx,45+32*k,16)')})"
_YS = f"list_transform(range(0, CAST(npts AS BIGINT)), k -> {_f754('substr(hx,61+32*k,16)')})"


def _points_cte(table_sql: str, id_col: str, extra_cols: str) -> str:
    """CTEs parsing the fixture WKB into coordinate lists (xs, ys), poisoned
    to NULL unless the geometry is the single-polygon single-ring shape the
    fixture generators emit."""
    return f"""
    raw AS (
      SELECT {id_col}, {extra_cols}, hex(geometry_wkb) AS hx, area_m2
      FROM {table_sql}
    ),
    hdr AS (
      SELECT *, {_NPOLYS} AS npolys, {_NRINGS} AS nrings, {_NPTS} AS npts
      FROM raw
    ),
    pts AS (
      SELECT *,
             CASE WHEN npolys=1 AND nrings=1 THEN {_XS} END AS xs,
             CASE WHEN npolys=1 AND nrings=1 THEN {_YS} END AS ys
      FROM hdr
    )"""


#: spherical-excess term for segment i (1-indexed lists cx/cy) — the exact
#: expression order of geo._ring_excess so every double matches bit-for-bit
_EXCESS_TERM = (
    f"2.0*atan2("
    f"tan(((cx[i+1]-cx[i])*{_DEG2RAD})/2.0)"
    f"*(tan((cy[i]*{_DEG2RAD})/2.0)+tan((cy[i+1]*{_DEG2RAD})/2.0)),"
    f"1.0+tan((cy[i]*{_DEG2RAD})/2.0)*tan((cy[i+1]*{_DEG2RAD})/2.0))"
)

#: shoelace term (geo._ring_area_planar): x_i·y_{i+1} − x_{i+1}·y_i
_SHOELACE_TERM = "cx[i]*cy[i+1]-cx[i+1]*cy[i]"


def _coords_json(xs: str, ys: str) -> str:
    """GeoJSON MultiPolygon coordinates of one ring, rendered exactly as
    Spark's to_json prints array<array<array<array<double>>>>."""
    return (
        f"('[[['||array_to_string(list_transform(range(0, len({xs})),"
        f" k -> '['||{xs}[k+1]::VARCHAR||','||{ys}[k+1]::VARCHAR||']'), ',')||']]]')"
    )


def _mojibake_repair_sql(expr: str) -> str:
    out = expr
    for bad, good in MOJIBAKE_MAP.items():
        out = f"replace({out},'{bad}','{good}')"
    return out


def _taxon_case(expr: str, mapping: dict[str, str]) -> str:
    whens = " ".join(f"WHEN '{k}' THEN '{v}'" for k, v in mapping.items())
    return f"(CASE {expr} {whens} END)"


def _facts_json(area: str) -> str:
    """The area facts array fragment (docmodel.area_facts): double/int/string
    renderings of the same ceiling'ed value, keys in struct order."""
    return (
        f"'[{{\"decimalValue\":'||{area}::VARCHAR"
        f"||',\"fact\":\"{AREA_FACT_URI}\",\"integerValue\":'"
        f"||CAST({area} AS INT)||',\"value\":\"'"
        f"||CAST(CAST({area} AS BIGINT) AS VARCHAR)||'\"}}]'"
    )


# ---------------------------------------------------------------------------
# full-document oracles
# ---------------------------------------------------------------------------


def documents_2023_sql() -> str:
    """Oracle for crowdsorsa_documents_2023: municipality recode + dim join,
    ring close (the fixture's make_valid case), ceil'd spherical geodesic
    area, area-gated facts & geometry choice, mojibake repair, taxon decode,
    full nested JSON string in Spark's struct order."""
    d = _fixture_dir_for_sql().replace("'", "''")
    obs = f"'{d}/observations_2023.parquet'"
    dim = f"'{d}/municipality_key.parquet'"
    doc_id = "'http://tun.fi/HR.5835/'||id"
    return f"""
    WITH {_points_cte(obs, 'id', 'kuntakoodi, havaittu, laji, torjunta')},
    closed AS (
      SELECT *,
        CASE WHEN xs[1]=xs[len(xs)] AND ys[1]=ys[len(ys)]
             THEN xs ELSE list_append(xs, xs[1]) END AS cx,
        CASE WHEN xs[1]=xs[len(xs)] AND ys[1]=ys[len(ys)]
             THEN ys ELSE list_append(ys, ys[1]) END AS cy
      FROM pts
    ),
    area AS (
      SELECT *,
        coalesce(area_m2, CAST(CAST(ceil(abs(
          list_sum(list_transform(range(1, len(cx)), i -> {_EXCESS_TERM}))
          * {_EARTH_R} * {_EARTH_R})) AS BIGINT) AS DOUBLE)) AS pinta_ala
      FROM closed
    ),
    enriched AS (
      SELECT a.*,
        m.municipality_name_fi AS muni,
        strftime(strptime(havaittu, '%Y-%m-%dT%H:%M:%S'), '%Y-%m-%d') AS d,
        hour(strptime(havaittu, '%Y-%m-%dT%H:%M:%S')) AS hh,
        minute(strptime(havaittu, '%Y-%m-%dT%H:%M:%S')) AS mm,
        {_mojibake_repair_sql('laji')} AS taxon,
        CASE WHEN pinta_ala > 0 THEN {_coords_json('cx', 'cy')}
             ELSE {_coords_json('xs', 'ys')} END AS coords
      FROM area a
      LEFT JOIN {dim} m
        ON (CASE WHEN a.kuntakoodi = '864' THEN '20' ELSE a.kuntakoodi END) = m.kunta
    )
    SELECT id AS obs_id,
      '{{"schema":"laji-etl","sourceId":"http://tun.fi/KE.1501"'
      ||',"collectionId":"http://tun.fi/HR.5835","documentId":"'||{doc_id}
      ||'","publicDocument":{{"concealment":"PUBLIC","keywords":["'||id
      ||'","crowdsorsa-'||muni||'"]'
      ||CASE WHEN torjunta IS NOT NULL
             THEN ',"notes":"Controlled: '||torjunta||'"' ELSE '' END
      ||',"gatherings":[{{"gatheringId":"'||{doc_id}||'_G"'
      ||',"eventDate":{{"begin":"'||d||'","end":"'||d||'"}}'
      ||',"hourBegin":'||hh||',"hourEnd":'||hh
      ||',"minuteBegin":'||mm||',"minuteEnd":'||mm
      ||',"municipality":"'||muni||'"'
      ||',"geo":{{"type":"FeatureCollection","crs":"WGS84","features":'
      ||'[{{"type":"Feature","geometry":{{"type":"MultiPolygon","coordinates":'
      ||coords||'}}}}]}}'
      ||',"units":[{{"unitId":"'||{doc_id}||'_U","taxonVerbatim":"'||taxon||'"'
      ||CASE WHEN {_taxon_case('taxon', TAXA_2023)} IS NOT NULL
             THEN ',"reportedTaxonId":"'||{_taxon_case('taxon', TAXA_2023)}||'"'
             ELSE '' END
      ||',"sourceTags":'
      ||CASE WHEN torjunta IS NULL THEN '[]' ELSE '["INVASIVE_PARTIAL"]' END
      ||CASE WHEN pinta_ala >= 1.0 THEN ',"facts":'||{_facts_json('pinta_ala')}
             ELSE '' END
      ||'}}]}}]}}}}' AS document_json
    FROM enriched
    """


def documents_2024_sql() -> str:
    """Oracle for crowdsorsa_documents_2024: year-typo repair, lowercase
    taxon, ceil'd planar shoelace area from the RAW ring (no validity pass —
    2024 pipeline parity), abundance fields, facts always present."""
    d = _fixture_dir_for_sql().replace("'", "''")
    obs = f"'{d}/observations_2024.parquet'"
    doc_id = "'http://tun.fi/HR.5835/'||tunniste"
    return f"""
    WITH {_points_cte(obs, 'tunniste', 'kunta, havaittu, torjuttu, laji, tiheys')},
    area AS (
      SELECT *, xs AS cx, ys AS cy,
        coalesce(area_m2, CAST(CAST(ceil(abs(abs(
          list_sum(list_transform(range(1, len(xs)),
                   i -> xs[i]*ys[i+1]-xs[i+1]*ys[i]))/2.0))) AS BIGINT) AS DOUBLE))
          AS pinta_ala
      FROM pts
    ),
    enriched AS (
      SELECT *,
        regexp_replace(havaittu, '^2026', '2024') AS hav_fixed,
        regexp_replace(torjuttu, '^2026', '2024') AS tor_fixed,
        lower(laji) AS taxon,
        {_coords_json('cx', 'cy')} AS coords
      FROM area
    )
    SELECT tunniste AS obs_id,
      '{{"schema":"laji-etl","sourceId":"http://tun.fi/KE.1501"'
      ||',"collectionId":"http://tun.fi/HR.5835","documentId":"'||{doc_id}
      ||'","publicDocument":{{"concealment":"PUBLIC","keywords":["'||tunniste
      ||'","crowdsorsa-'||kunta||'"]'
      ||CASE WHEN tor_fixed IS NOT NULL
             THEN ',"notes":"Controlled: '||tor_fixed||'"' ELSE '' END
      ||',"gatherings":[{{"gatheringId":"'||{doc_id}||'_G"'
      ||',"eventDate":{{"begin":"'
      ||strftime(strptime(hav_fixed, '%Y-%m-%d'), '%Y-%m-%d')
      ||'","end":"'||strftime(strptime(hav_fixed, '%Y-%m-%d'), '%Y-%m-%d')||'"}}'
      ||',"municipality":"'||kunta||'"'
      ||',"geo":{{"type":"FeatureCollection","crs":"EUREF","features":'
      ||'[{{"type":"Feature","geometry":{{"type":"MultiPolygon","coordinates":'
      ||coords||'}}}}]}}'
      ||',"units":[{{"unitId":"'||{doc_id}||'_U","taxonVerbatim":"'||taxon||'"'
      ||CASE WHEN {_taxon_case('taxon', TAXA_2024)} IS NOT NULL
             THEN ',"reportedTaxonId":"'||{_taxon_case('taxon', TAXA_2024)}||'"'
             ELSE '' END
      ||',"sourceTags":'
      ||CASE WHEN tor_fixed IS NULL THEN '[]' ELSE '["INVASIVE_PARTIAL"]' END
      ||',"abundanceString":"'||tiheys::VARCHAR||'"'
      ||',"abundanceUnit":"RELATIVE_DENSITY"'
      ||',"facts":'||{_facts_json('pinta_ala')}
      ||'}}]}}]}}}}' AS document_json
    FROM enriched
    """


# ---------------------------------------------------------------------------
# spatial-join oracle: ALL-PAIRS even-odd ray cast as the semantic ground
# truth. The Spark side runs the grid-bucketed plan (operators/spatial.py);
# hash-matching this oracle therefore proves BOTH the ray-cast verify and
# the soundness/completeness of the cell prefilter (a lost or invented
# candidate pair would break the match). Probe points derive from the
# polygon envelopes with identical arithmetic in both engines (pure +-*/ on
# fixture doubles — no libm, bit-identical), placed strictly inside /
# outside so no probe sits on an edge (where ray-cast half-open semantics
# would be representation-sensitive).
# ---------------------------------------------------------------------------

#: mirrors geo._point_in_ring's edge test EXACTLY (same operator order and
#: precedence); the CASE guard makes the division safe in DuckDB's
#: non-short-circuit AND (IEEE inf compares harmlessly under a false guard)
_RAYCAST_EDGE = (
    "CASE WHEN (pl.ys[i] > pt.py) != (pl.ys[i+1] > pt.py)"
    " AND pt.px < pl.xs[i] + (pt.py - pl.ys[i]) * (pl.xs[i+1] - pl.xs[i])"
    " / (pl.ys[i+1] - pl.ys[i]) THEN 1 ELSE 0 END"
)


def spatial_join_sql() -> str:
    d = _fixture_dir_for_sql().replace("'", "''")
    obs = f"'{d}/observations_2024.parquet'"
    return f"""
    WITH {_points_cte(obs, 'tunniste', 'kunta')},
    poly AS (SELECT tunniste AS poly_id, xs, ys FROM pts),
    env AS (
      SELECT poly_id,
             list_min(xs) AS xmin, list_max(xs) AS xmax,
             list_min(ys) AS ymin, list_max(ys) AS ymax
      FROM poly
    ),
    probes AS (
      SELECT poly_id || '_in' AS point_id,
             (xmin + xmax) / 2.0 AS px, (ymin + ymax) / 2.0 AS py
      FROM env
      UNION ALL
      SELECT poly_id || '_out',
             xmax + (xmax - xmin) + 1.0, (ymin + ymax) / 2.0
      FROM env
    )
    SELECT pt.point_id, pl.poly_id
    FROM probes pt CROSS JOIN poly pl
    WHERE (list_sum(list_transform(range(1, len(pl.xs)),
             i -> {_RAYCAST_EDGE}))) % 2 = 1
    """


def _raycast_inside(xs: str, ys: str, px: str, py: str) -> str:
    """Even-odd ray-cast "strictly inside" over 1-indexed coord lists —
    the same expression tree as _RAYCAST_EDGE / geo._point_in_ring."""
    edge = (
        f"CASE WHEN ({ys}[i] > {py}) != ({ys}[i+1] > {py})"
        f" AND {px} < {xs}[i] + ({py} - {ys}[i]) * ({xs}[i+1] - {xs}[i])"
        f" / ({ys}[i+1] - {ys}[i]) THEN 1 ELSE 0 END"
    )
    return f"(list_sum(list_transform(range(1, len({xs})), i -> {edge}))) % 2 = 1"


def polygon_join_sql() -> str:
    """ALL-PAIRS ground truth for operators/spatial.grid_polygon_join over
    the 2024 fixture polygons vs their half-extent-shifted copies: a pair
    intersects iff any boundary edge pair intersects (four-orientation
    test + collinear bbox, the exact expression tree of
    geo._segments_intersect) or one polygon's first vertex lies inside the
    other (ray-cast). The hash gate therefore proves the grid prefilter,
    the reference-cell dedup, and the exact verify all at once."""
    d = _fixture_dir_for_sql().replace("'", "''")
    obs = f"'{d}/observations_2024.parquet'"
    # d1..d4: orientation cross products; EXACT operand order of geo._cross3
    d1 = "((x4-x3)*(y1-y3) - (y4-y3)*(x1-x3))"
    d2 = "((x4-x3)*(y2-y3) - (y4-y3)*(x2-x3))"
    d3 = "((x2-x1)*(y3-y1) - (y2-y1)*(x3-x1))"
    d4 = "((x2-x1)*(y4-y1) - (y2-y1)*(x4-x1))"
    seg_pred = f"""(
      ((({d1}) > 0 AND ({d2}) < 0) OR (({d1}) < 0 AND ({d2}) > 0))
      AND ((({d3}) > 0 AND ({d4}) < 0) OR (({d3}) < 0 AND ({d4}) > 0))
    )
    OR (({d1}) = 0 AND least(x3,x4) <= x1 AND x1 <= greatest(x3,x4)
        AND least(y3,y4) <= y1 AND y1 <= greatest(y3,y4))
    OR (({d2}) = 0 AND least(x3,x4) <= x2 AND x2 <= greatest(x3,x4)
        AND least(y3,y4) <= y2 AND y2 <= greatest(y3,y4))
    OR (({d3}) = 0 AND least(x1,x2) <= x3 AND x3 <= greatest(x1,x2)
        AND least(y1,y2) <= y3 AND y3 <= greatest(y1,y2))
    OR (({d4}) = 0 AND least(x1,x2) <= x4 AND x4 <= greatest(x1,x2)
        AND least(y1,y2) <= y4 AND y4 <= greatest(y1,y2))"""
    return f"""
    WITH {_points_cte(obs, 'tunniste', 'kunta')},
    polyA AS (SELECT tunniste AS a_id, xs, ys FROM pts),
    polyB AS (
      SELECT tunniste AS b_id,
             list_transform(xs, v -> v + (list_max(xs) - list_min(xs)) / 2.0)
               AS xs,
             list_transform(ys, v -> v + (list_max(ys) - list_min(ys)) / 2.0)
               AS ys
      FROM pts
    ),
    eA AS (
      SELECT a_id, xs[i] AS x1, ys[i] AS y1, xs[i+1] AS x2, ys[i+1] AS y2
      FROM (SELECT a_id, xs, ys, unnest(range(1, len(xs))) AS i FROM polyA)
    ),
    eB AS (
      SELECT b_id, xs[i] AS x3, ys[i] AS y3, xs[i+1] AS x4, ys[i+1] AS y4
      FROM (SELECT b_id, xs, ys, unnest(range(1, len(xs))) AS i FROM polyB)
    ),
    seg AS (
      SELECT DISTINCT a_id, b_id
      FROM eA CROSS JOIN eB
      WHERE {seg_pred}
    ),
    contain AS (
      SELECT a.a_id, b.b_id
      FROM polyA a CROSS JOIN polyB b
      WHERE ({_raycast_inside('a.xs', 'a.ys', 'b.xs[1]', 'b.ys[1]')})
         OR ({_raycast_inside('b.xs', 'b.ys', 'a.xs[1]', 'a.ys[1]')})
    )
    SELECT a_id, b_id FROM seg
    UNION
    SELECT a_id, b_id FROM contain
    """
