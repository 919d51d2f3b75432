"""Sitemap seed discovery: native Sitemap-line/XML parsing + end-to-end
fetch over the fabric, cross-checked against the independent
ElementTree-based golden model's rules (host scope, one index level)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from httpz_spark.functions.robotsx import robots_sitemaps
from httpz_spark.functions.sitemapx import (
    loc_host_matches,
    sitemap_is_index,
    sitemap_locs,
)
from httpz_spark.operators.sitemapfetch import (
    _sitemap_row_gen,
    sitemap_seed_frame,
)
from httpz_spark.sources import fabric as FB

WORLD = FB.FabricConfig(n_images=64, n_hosts=12).with_certs()


def _one(spark, expr_builder, value):
    return spark.createDataFrame([(value,)], "v string").select(
        expr_builder(F.col("v")).alias("out")
    ).collect()[0]["out"]


def test_robots_sitemap_line_extraction(spark):
    txt = ("# header\n"
           "Sitemap: https://h.test/sitemap.xml\n"
           "User-agent: *\nDisallow: /x/\n"
           "sitemap: https://h.test/other.xml  # trailing comment\n"
           "SITEMAP: https://h.test/sitemap.xml\n")  # dup -> collapsed
    got = list(_one(spark, robots_sitemaps, txt))
    assert got == ["https://h.test/sitemap.xml", "https://h.test/other.xml"]
    assert list(_one(spark, robots_sitemaps, "User-agent: *\n")) == []


def test_sitemap_loc_parsing_and_index_detection(spark):
    urlset = ('<?xml version="1.0"?>\n'
              '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
              "  <url><loc> https://h.test/a </loc>"
              "<lastmod>2026-01-01</lastmod></url>\n"
              "  <url><LOC>https://h.test/b?x=1&amp;y=2</LOC></url>\n"
              "  <url><loc>https://h.test/a</loc></url>\n"  # dup
              "</urlset>")
    assert not _one(spark, sitemap_is_index, urlset)
    assert list(_one(spark, sitemap_locs, urlset)) == [
        "https://h.test/a", "https://h.test/b?x=1&y=2"]
    index = ('<sitemapindex xmlns="x"><sitemap>'
             "<loc>https://h.test/sitemap-0.xml</loc></sitemap></sitemapindex>")
    assert _one(spark, sitemap_is_index, index)
    assert list(_one(spark, sitemap_locs, index)) == [
        "https://h.test/sitemap-0.xml"]


def test_loc_host_scope_rule(spark):
    rows = [("https://H.TEST/x", "h.test", True),
            ("http://h.test/", "h.test", True),
            ("https://evil.test/x", "h.test", False),
            ("ftp://h.test/x", "h.test", False),
            ("not a url", "h.test", False),
            ("https://h.test:8080/x", "h.test", False)]  # explicit port != bare host
    df = spark.createDataFrame(rows, "loc string, host string, want boolean")
    got = df.select("want", loc_host_matches(F.col("loc"), F.col("host"))
                    .alias("got")).collect()
    for r in got:
        assert r["got"] == r["want"], r


def test_sitemap_gen_scheme_order_and_fallback():
    """The generator tries the URL's own scheme first, the other second;
    non-200 falls through, first 200 wins (same contract as robots)."""
    class _Resp:
        def __init__(self, status, body=b"", charset="utf-8"):
            self.status, self.body, self.charset = status, body, charset

    g = _sitemap_row_gen("http://h.test/sitemap.xml")
    req = g.send(None)
    assert req[0].startswith("http://") and req[1] == "http"
    req = g.send((_Resp(404), None))
    assert req[0].startswith("https://")
    try:
        g.send((_Resp(200, b"<urlset/>"), None))
        raise AssertionError("must stop on 200")
    except StopIteration as s:
        assert s.value == {"fetch_status": 200, "body": "<urlset/>",
                           "error_type": None}
    # malformed URL -> contained PROCESS row, not an exception
    g = _sitemap_row_gen("nonsense")
    try:
        g.send(None)
        raise AssertionError("must stop immediately")
    except StopIteration as s:
        assert s.value["error_type"] == "PROCESS"


def test_sitemap_seed_frame_end_to_end(spark):
    """Engine discovery over the fabric obeys the model's rules: every
    seed is a same-host /li/ page URL; hosts advertising no sitemap (or
    whose robots/sitemap fetches fail) contribute nothing; index hosts'
    children are followed exactly one level."""
    hosts = spark.createDataFrame(
        [(h,) for h in FB.all_hosts(WORLD)], "host string")
    got = sitemap_seed_frame(hosts, WORLD, partitions=4).collect()
    assert len(got) > 0
    by_host: dict = {}
    for r in got:
        by_host.setdefault(r["host"], set()).add(r["loc"])
        host = r["host"]
        assert r["loc"].startswith(f"https://{host}/li/img"), r
    # hosts with hs % 4 == 3 advertise no sitemap -> absent
    for host in FB.all_hosts(WORLD):
        hs = FB.h64(f"{WORLD.seed}:sitemap:{host}")
        if hs % 4 == 3:
            assert host not in by_host, host
    # at least one index-style host resolved through its children
    idx_hosts = [h for h in by_host
                 if FB.h64(f"{WORLD.seed}:sitemap:{h}") % 3 == 0]
    assert idx_hosts
    # cross-host locs (hs % 5 == 0 urlsets embed one) never leak through
    for host, locs in by_host.items():
        assert all(f"https://{host}/" in u for u in locs)
