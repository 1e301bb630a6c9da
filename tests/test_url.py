"""URL canonicalization rules — each rule isolated, plus the combined
form and the registered-domain suffix logic."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crowdsorsa_etl_spark.functions.url import (
    canonicalize_url,
    registered_domain,
    url_host,
)


def _canon(spark, url):
    df = spark.createDataFrame([(url,)], "u string")
    return df.select(canonicalize_url(F.col("u")).alias("c")).collect()[0]["c"]


def _domain(spark, host):
    df = spark.createDataFrame([(host,)], "h string")
    return df.select(registered_domain(F.col("h")).alias("d")).collect()[0]["d"]


class TestCanonicalize:
    def test_lowercases_scheme_and_host_only(self, spark):
        assert (
            _canon(spark, "HTTPS://EX.COM/Path/File?X=1")
            == "https://ex.com/Path/File?X=1"
        )

    def test_strips_www_and_default_ports(self, spark):
        assert _canon(spark, "https://www.ex.com:443/a") == "https://ex.com/a"
        assert _canon(spark, "http://ex.com:80/a") == "http://ex.com/a"

    def test_keeps_nonstandard_port(self, spark):
        assert _canon(spark, "https://ex.com:8443/a") == "https://ex.com:8443/a"
        # 443 is only default for https
        assert _canon(spark, "http://ex.com:443/a") == "http://ex.com:443/a"

    def test_drops_fragment_and_trailing_slash(self, spark):
        assert _canon(spark, "https://ex.com/a/b/#sec") == "https://ex.com/a/b"
        assert _canon(spark, "https://ex.com/a///") == "https://ex.com/a"

    def test_filters_tracking_params_and_sorts(self, spark):
        assert (
            _canon(spark, "https://ex.com/p?utm_source=x&b=2&a=1&fbclid=z&gclid=q")
            == "https://ex.com/p?a=1&b=2"
        )

    def test_query_dropped_entirely_when_all_tracking(self, spark):
        assert _canon(spark, "https://ex.com/p?utm_c=1") == "https://ex.com/p"

    def test_bare_host(self, spark):
        assert _canon(spark, "https://Ex.com") == "https://ex.com"

    def test_non_url_input_becomes_empty(self, spark):
        assert _canon(spark, "not a url") == ""


class TestRegisteredDomain:
    @pytest.mark.parametrize(
        ("host", "want"),
        [
            ("a.b.ex.com", "ex.com"),
            ("ex.com", "ex.com"),
            ("sub.ex.co.uk", "ex.co.uk"),
            ("deep.sub.ex.ac.uk", "ex.ac.uk"),
            ("ex.com.au", "ex.com.au"),
            ("localhost", "localhost"),
            ("co.uk", "co.uk"),
        ],
    )
    def test_suffix_rules(self, spark, host, want):
        assert _domain(spark, host) == want

    def test_host_extraction_composes(self, spark):
        df = spark.createDataFrame(
            [("HTTPS://WWW.Sub.Ex.CO.UK:443/x?y=1#f",)], "u string"
        )
        got = df.select(
            registered_domain(url_host(F.col("u"))).alias("d")
        ).collect()[0]["d"]
        assert got == "ex.co.uk"
