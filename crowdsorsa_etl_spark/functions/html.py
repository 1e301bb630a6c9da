"""HTML → text extraction for web-corpus ingestion.

A crawled corpus starts as HTML; the first pipeline stage strips markup
and measures boilerplate signals (tag counts, link density — the justext/
boilerpipe family of features) before any quality filtering or dedup can
run. Everything here is pure column expressions — JVM-side, whole-stage
codegen, linear in the scan — and every regex is RE2-safe (no
backreferences, no lookaround) so the SAME pattern strings replay
identically in DuckDB oracles (the curation PII posture,
``operators/curation.py``).

Scope: script/style/comment removal, tag stripping, the named entities a
text pipeline actually meets (amp/lt/gt/quot/apos/nbsp + the ubiquitous
``&#39;``), whitespace normalization. Numeric character references beyond
``&#39;`` are out of scope for the expression tier — a corpus needing
full entity decoding routes through an Arrow stage, but none of the
boilerplate-signal math changes.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: entity decode order matters: ``&amp;`` LAST, so ``&amp;lt;`` decodes to
#: the literal text ``&lt;`` rather than double-decoding to ``<``.
HTML_ENTITIES: list[tuple[str, str]] = [
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&apos;", "'"),
    ("&#39;", "'"),
    ("&amp;", "&"),
]

#: RE2-safe block patterns — one pass per block kind instead of a
#: backreferenced ``</\1>`` (RE2 has no backreferences).
_BLOCK_PATTERNS = [
    r"(?s)<!--.*?-->",
    r"(?is)<script[^>]*>.*?</script>",
    r"(?is)<style[^>]*>.*?</style>",
]
_TAG_PATTERN = r"(?s)</?[a-zA-Z][^>]*>"
# word boundary after "a": <a ...> or <a>, never <article>/<aside>/...
_ANCHOR_PATTERN = r"(?is)<a(?:\s[^>]*)?>(.*?)</a>"


def escape_html_text(col: Column) -> Column:
    """Text → HTML-safe text (``&`` first, then ``<``/``>``) — the builder
    side of the round-trip the extraction oracle gates."""
    out = F.replace(col, F.lit("&"), F.lit("&amp;"))
    out = F.replace(out, F.lit("<"), F.lit("&lt;"))
    return F.replace(out, F.lit(">"), F.lit("&gt;"))


def strip_html(col: Column) -> Column:
    """HTML → plain text: drop comment/script/style blocks, strip tags,
    decode the common entities, collapse whitespace. Deterministic and
    SQL-replayable with the identical pattern strings."""
    out = col
    for pat in _BLOCK_PATTERNS:
        out = F.regexp_replace(out, pat, " ")
    out = F.regexp_replace(out, _TAG_PATTERN, " ")
    for ent, repl in HTML_ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(repl))
    return F.trim(F.regexp_replace(out, r"\s+", " "))


def html_tag_count(col: Column) -> Column:
    """Number of element tags (open or close) in the raw HTML."""
    return F.size(F.regexp_extract_all(col, F.lit(_TAG_PATTERN), F.lit(0)))


def html_link_density(col: Column) -> Column:
    """Fraction of extracted text characters that live inside anchor
    elements — the classic boilerplate discriminator (nav bars and footers
    are link-dense; article bodies are not). Both numerator and
    denominator measure post-strip text, so the ratio is markup-free."""
    anchors = F.regexp_extract_all(col, F.lit(_ANCHOR_PATTERN), F.lit(1))
    anchor_chars = F.aggregate(
        anchors,
        F.lit(0),
        lambda acc, a: acc + F.length(strip_html(a)),
    )
    total = F.length(strip_html(col))
    return F.when(total == 0, F.lit(0.0)).otherwise(
        F.round(anchor_chars / total.cast("double"), 6)
    )


_HREF_PATTERN = r'(?is)<a\s[^>]*href\s*=\s*"([^"]*)"[^>]*>'


def html_links(col: Column) -> Column:
    """All ``href`` values of anchor tags, in document order — the crawl
    frontier's input. Double-quoted hrefs only (the emitted-HTML norm);
    RE2-safe and replayed verbatim by the oracle."""
    return F.regexp_extract_all(col, F.lit(_HREF_PATTERN), F.lit(1))
