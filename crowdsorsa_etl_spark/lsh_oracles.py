"""DuckDB oracle SQL generators for the portable-hash LSH operators.

Each generator mirrors, fragment by fragment, the Spark plan built by the
corresponding ``operators/dedup.py`` function with ``portable=True``: same
normalization, same md5-derived hash words (functions/portable_hash), same
null-skipping ``concat_ws`` combines, same band layout. Parameters are the
single source of truth — the band loop that builds the Spark ``F.struct``
array also unrolls the SQL ``UNION ALL`` here, so a parameter change cannot
desynchronize the two engines.

These exist so the driver's correctness gate can hash-compare the LSH
queries (llm_minhash_lsh, llm_simhash, llm_simhash_hamming,
llm_winnow_overlap) against DuckDB instead of recording rows-only.
"""

from __future__ import annotations

from crowdsorsa_etl_spark.functions.portable_hash import (
    combine60_sql,
    cw_hash_sql,
    h64_sql,
    hex60_sql,
)

# must match dedup._norm (Spark: lower(regexp_replace(trim(text), '\s+', ' ')))
_NORM = "lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))"

# token explode with 0-based positions, matching F.posexplode over F.split.
# generate_subscripts is 1-based → subtract 1 (only relative order matters,
# but keeping the exact values makes the fragments directly comparable).
_TOKS = f"""
  raw AS (
    SELECT doc_id AS id,
           unnest(string_split({_NORM}, ' ')) AS t,
           generate_subscripts(string_split({_NORM}, ' '), 1) - 1 AS pos
    FROM documents
  )
"""


def minhash_lsh_sql(
    num_hashes: int = 16, bands: int = 8, shingle_k: int = 3
) -> str:
    """Oracle for minhash_lsh_candidates(..., portable=True)."""
    rows_per_band = num_hashes // bands
    lead_cols = ", ".join(
        f"lead(th, {j}) OVER w AS t{j}" for j in range(1, shingle_k)
    )
    shingle = combine60_sql("th", *[f"t{j}" for j in range(1, shingle_k)])
    mh_aggs = ",\n           ".join(
        f"min({cw_hash_sql('h', i)}) AS mh{i}" for i in range(num_hashes)
    )
    band_selects = "\n    UNION ALL\n".join(
        "    SELECT id, {b} AS band, {bucket} AS bucket FROM sig".format(
            b=b,
            bucket=combine60_sql(
                *[f"mh{b * rows_per_band + r}" for r in range(rows_per_band)],
                seed=f"b{b}",
            ),
        )
        for b in range(bands)
    )
    return f"""
    WITH {_TOKS},
    toks AS (SELECT id, pos, {hex60_sql('t')} AS th FROM raw),
    sh0 AS (
      SELECT id, th, {lead_cols}
      FROM toks
      WINDOW w AS (PARTITION BY id ORDER BY pos)
    ),
    sh AS (SELECT id, {shingle} AS h FROM sh0),
    sig AS (
      SELECT id,
           {mh_aggs}
      FROM sh GROUP BY id
    ),
    banded AS (
{band_selects}
    )
    SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_bands_matched
    FROM banded a
    JOIN banded b ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id
    GROUP BY 1, 2
    """


def _simhash_sig_cte() -> str:
    """CTEs raw→tok→votes→sig producing (id, simhash) — the portable
    simhash_signatures pipeline. Bit masks are Python-computed literals so
    neither engine shifts by 63 (DuckDB overflows on 1<<63; bit 63's mask is
    the INT64_MIN literal, whose single set bit is the sign bit)."""
    votes = ",\n             ".join(
        "sum(CASE WHEN (h & ({m})) != 0 THEN 1 ELSE -1 END) AS v{j}".format(
            m=(1 << j) if j < 63 else -(1 << 63), j=j
        )
        for j in range(64)
    )
    pack_terms = " + ".join(
        "(CASE WHEN v{j} > 0 THEN CAST({m} AS BIGINT) ELSE 0 END)".format(
            j=j, m=(1 << j) if j < 63 else -(1 << 63)
        )
        for j in range(64)
    )
    return f"""{_TOKS},
    tok AS (SELECT id, {h64_sql('t')} AS h FROM raw),
    votes AS (
      SELECT id,
             {votes}
      FROM tok GROUP BY id
    ),
    sig AS (SELECT id, ({pack_terms}) AS simhash FROM votes)"""


def simhash_buckets_sql() -> str:
    """Oracle for simhash_buckets(..., portable=True)."""
    return f"""
    WITH {_simhash_sig_cte()}
    SELECT simhash,
           array_to_string(list_sort(list(id)), ',') AS ids,
           count(*) AS n
    FROM sig GROUP BY simhash HAVING count(*) > 1
    """


def simhash_hamming_sql(radius: int = 4, bands: int | None = None) -> str:
    """Oracle for simhash_hamming_candidates(..., portable=True).

    Spark extracts band bits with shiftrightunsigned; DuckDB's >> is an
    arithmetic shift, so every band — including the last, which Spark leaves
    unmasked — applies an explicit width mask: (h >> s) & ((1 << (64-s)) - 1)
    equals the unsigned shift for s > 0.
    """
    if bands is None:
        bands = radius + 1
    width = 64 // bands
    selects = []
    for b in range(bands):
        shift = b * width
        nbits = width if b < bands - 1 else 64 - shift
        mask = (1 << nbits) - 1
        selects.append(
            f"    SELECT id, simhash, {b} AS band,"
            f" ((simhash >> {shift}) & {mask}) AS bits FROM sig"
        )
    band_union = "\n    UNION ALL\n".join(selects)
    return f"""
    WITH {_simhash_sig_cte()},
    banded AS (
{band_union}
    ),
    cand AS (
      SELECT a.id AS id_a, b.id AS id_b,
             min(a.simhash) AS sa, min(b.simhash) AS sb
      FROM banded a
      JOIN banded b ON a.band = b.band AND a.bits = b.bits AND a.id < b.id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b, CAST(bit_count(xor(sa, sb)) AS INTEGER) AS hamming
    FROM cand
    WHERE bit_count(xor(sa, sb)) <= {radius}
    """


def winnow_overlap_sql(
    k: int = 4, window: int = 4, min_shared: int = 2, max_doc_freq: int = 100
) -> str:
    """Oracle for winnow_overlap_pairs(..., portable=True)."""
    lead_cols = ", ".join(f"lead(th, {j}) OVER w AS t{j}" for j in range(1, k))
    kgram = combine60_sql("th", *[f"t{j}" for j in range(1, k)])
    return f"""
    WITH {_TOKS},
    toks AS (SELECT id, pos, {hex60_sql('t')} AS th FROM raw),
    kg0 AS (
      SELECT id, pos, th, {lead_cols}
      FROM toks
      WINDOW w AS (PARTITION BY id ORDER BY pos)
    ),
    kg AS (
      SELECT id, pos, {kgram} AS h
      FROM kg0 WHERE t{k - 1} IS NOT NULL
    ),
    fps AS (
      SELECT DISTINCT id,
             min(h) OVER (PARTITION BY id ORDER BY pos
                          ROWS BETWEEN CURRENT ROW AND {window - 1} FOLLOWING)
               AS fp
      FROM kg
    ),
    rare AS (
      SELECT fp FROM fps GROUP BY fp HAVING count(*) <= {max_doc_freq}
    ),
    fr AS (SELECT fps.id, fps.fp FROM fps JOIN rare USING (fp))
    SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_shared
    FROM fr a JOIN fr b ON a.fp = b.fp AND a.id < b.id
    GROUP BY 1, 2 HAVING count(*) >= {min_shared}
    """
