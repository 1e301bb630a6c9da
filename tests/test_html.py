"""HTML extraction tier: strip/escape/signals. Patterns must be RE2-safe
(the oracle replays them in DuckDB), so these tests pin the exact
semantics the cross-engine gate relies on."""

from __future__ import annotations

import pyspark.sql.functions as F

from crowdsorsa_etl_spark.functions.html import (
    escape_html_text,
    html_link_density,
    html_tag_count,
    strip_html,
)


def _one(spark, html, expr):
    df = spark.createDataFrame([(html,)], "h string")
    return df.select(expr(F.col("h")).alias("v")).collect()[0]["v"]


class TestStripHtml:
    def test_tags_scripts_styles_comments_removed(self, spark):
        h = (
            "<html><!-- hidden --><style>p {color: red}</style>"
            "<body><h1>Title</h1><p>Hello <b>world</b></p>"
            "<script>if (1<2) { alert('<p>'); }</script></body></html>"
        )
        assert _one(spark, h, strip_html) == "Title Hello world"

    def test_entity_decode_order(self, spark):
        # &amp;lt; must become the literal text '&lt;', never '<'
        h = "<p>a &amp;lt; b &amp; c &lt;tag&gt; &quot;q&quot; &#39;s&#39;</p>"
        assert (
            _one(spark, h, strip_html)
            == "a &lt; b & c <tag> \"q\" 's'"
        )

    def test_escape_roundtrip(self, spark):
        txt = 'x < y & z > "w" &amp; raw'
        df = spark.createDataFrame([(txt,)], "t string")
        page = F.concat(
            F.lit("<p>"), escape_html_text(F.col("t")), F.lit("</p>")
        )
        got = df.select(strip_html(page).alias("v")).collect()[0]["v"]
        assert got == txt

    def test_multiline_blocks(self, spark):
        h = "<script>\nvar a = 1;\nvar b = '</div>';\n</script><p>kept</p>"
        assert _one(spark, h, strip_html) == "kept"


class TestHtmlSignals:
    def test_tag_count(self, spark):
        h = '<div class="x"><p>a</p><br/></div>'
        assert _one(spark, h, html_tag_count) == 5

    def test_link_density(self, spark):
        # anchors: 'nav' (3 chars, tags inside stripped) + 'menu' (4);
        # total extracted text: 'nav menu body text' = 18 chars
        h = (
            '<a href="/"><b>nav</b></a> <a>menu</a> body text'
        )
        assert _one(spark, h, html_link_density) == round(7 / 18, 6)

    def test_empty_page_density_is_zero(self, spark):
        assert _one(spark, "<p></p>", html_link_density) == 0.0


class TestHtmlLinks:
    def test_hrefs_in_document_order(self, spark):
        from crowdsorsa_etl_spark.functions.html import html_links

        h = (
            '<a href="/a">1</a><a class="x" href = "https://b.com/">2</a>'
            "<a>no-href</a><A HREF=\"/c\">3</A>"
        )
        got = _one(spark, h, html_links)
        assert list(got) == ["/a", "https://b.com/", "/c"]

    def test_no_links(self, spark):
        from crowdsorsa_etl_spark.functions.html import html_links

        assert list(_one(spark, "<p>plain</p>", html_links)) == []
