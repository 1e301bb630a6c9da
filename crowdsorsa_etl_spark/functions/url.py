"""URL canonicalization — the curation-pipeline normalizer.

Web-scale corpora key almost everything on URLs: exact-dup grouping,
per-domain quotas, crawl frontier dedup, robots/blocklist joins. Raw
URLs are noisy (case, default ports, tracking params, fragments,
trailing slashes), so every pipeline canonicalizes before keying.

All pure column expressions — one regexp parse + array HOFs, fully
codegen, no UDFs, trivially replayable in the DuckDB oracle. At 100 TB
this is a narrow map stage; the only shuffle lives in whatever keys on
the canonical form afterwards.

Canonical form applied (the common subset of Google SafeBrowsing /
crawler practice that stays order-deterministic):
  * scheme and host lowercased; leading ``www.`` stripped
  * default ports dropped (``http:80``, ``https:443``; any other
    explicit port kept)
  * fragment dropped
  * tracking params removed (``utm_*``, ``fbclid``, ``gclid``),
    remaining query params sorted bytewise
  * trailing slashes stripped from the path
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# scheme :// host [:port] path [?query] [#fragment]
URL_REGEX = (
    r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#:]+)(?::(\d+))?"
    r"([^?#]*)(?:\?([^#]*))?(?:#.*)?$"
)

# two-level public suffixes recognized by the naive registered-domain
# rule below (a deliberate small literal subset — the full PSL is a
# broadcast dim table in production; keep in lockstep with the oracle)
TWO_LEVEL_SUFFIXES = ("co.uk", "org.uk", "ac.uk", "com.au", "co.jp")

TRACKING_PREFIXES = ("utm_", "fbclid=", "gclid=")


def canonicalize_url(url: Column) -> Column:
    """Canonical URL string ('' stays '' for non-matching input)."""
    scheme = F.lower(F.regexp_extract(url, URL_REGEX, 1))
    host0 = F.lower(F.regexp_extract(url, URL_REGEX, 2))
    host = F.when(
        host0.startswith("www."), F.substring(host0, 5, 1_000_000)
    ).otherwise(host0)
    port = F.regexp_extract(url, URL_REGEX, 3)
    port_part = F.when(
        (port == "")
        | ((scheme == F.lit("http")) & (port == "80"))
        | ((scheme == F.lit("https")) & (port == "443")),
        F.lit(""),
    ).otherwise(F.concat(F.lit(":"), port))
    path = F.regexp_replace(F.regexp_extract(url, URL_REGEX, 4), "/+$", "")
    query = F.regexp_extract(url, URL_REGEX, 5)
    kept = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: ~(
                p.startswith(TRACKING_PREFIXES[0])
                | p.startswith(TRACKING_PREFIXES[1])
                | p.startswith(TRACKING_PREFIXES[2])
            )
            & (p != ""),
        )
    )
    query_part = F.when(
        F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(kept, "&"))
    ).otherwise(F.lit(""))
    return F.when(scheme == "", F.lit("")).otherwise(
        F.concat(scheme, F.lit("://"), host, port_part, path, query_part)
    )


def url_host(url: Column) -> Column:
    """Lowercased, www-stripped host of a URL."""
    host0 = F.lower(F.regexp_extract(url, URL_REGEX, 2))
    return F.when(
        host0.startswith("www."), F.substring(host0, 5, 1_000_000)
    ).otherwise(host0)


def registered_domain(host: Column) -> Column:
    """Naive eTLD+1: last two host labels, or last three when the final
    two form a known two-level suffix (TWO_LEVEL_SUFFIXES)."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(".", F.get(labels, n - 2), F.get(labels, n - 1))
    last3 = F.concat_ws(
        ".", F.get(labels, n - 3), F.get(labels, n - 2), F.get(labels, n - 1)
    )
    return (
        F.when(n <= 2, host)
        .when(last2.isin(*TWO_LEVEL_SUFFIXES), last3)
        .otherwise(last2)
    )


def canonical_url_sql(url_expr: str) -> str:
    """DuckDB replay of canonicalize_url/registered_domain over the SAME
    raw expression — kept beside the Spark ops so both stay in lockstep."""
    # DuckDB single-quoted literals do not process backslash escapes —
    # only quotes need doubling
    pat = URL_REGEX.replace("'", "''")
    suffixes = ", ".join(f"'{s}'" for s in TWO_LEVEL_SUFFIXES)
    return f"""
      SELECT *,
        CASE WHEN scheme = '' THEN '' ELSE
          scheme || '://' || host ||
          CASE WHEN port = '' OR (scheme = 'http' AND port = '80')
                    OR (scheme = 'https' AND port = '443')
               THEN '' ELSE ':' || port END ||
          regexp_replace(path, '/+$', '') ||
          CASE WHEN len(kept) > 0 THEN '?' || array_to_string(kept, '&')
               ELSE '' END
        END AS url_canon,
        CASE WHEN len(string_split(host, '.')) <= 2 THEN host
             WHEN array_to_string(string_split(host, '.')[-2:], '.')
                  IN ({suffixes})
             THEN array_to_string(string_split(host, '.')[-3:], '.')
             ELSE array_to_string(string_split(host, '.')[-2:], '.')
        END AS domain
      FROM (
        SELECT *,
          list_sort(list_filter(string_split(query, '&'),
            p -> NOT (starts_with(p, 'utm_') OR starts_with(p, 'fbclid=')
                      OR starts_with(p, 'gclid=')) AND p <> '')) AS kept
        FROM (
          SELECT *,
            lower(regexp_extract(raw_url, '{pat}', 1)) AS scheme,
            CASE WHEN starts_with(lower(regexp_extract(raw_url, '{pat}', 2)), 'www.')
                 THEN substring(lower(regexp_extract(raw_url, '{pat}', 2)), 5)
                 ELSE lower(regexp_extract(raw_url, '{pat}', 2)) END AS host,
            regexp_extract(raw_url, '{pat}', 3) AS port,
            regexp_extract(raw_url, '{pat}', 4) AS path,
            regexp_extract(raw_url, '{pat}', 5) AS query
          FROM ({url_expr})
        )
      )
    """
