"""Sitemap XML parsing as native column expressions.

Crawlers discover seeds from ``Sitemap:`` lines in robots.txt
(:func:`httpz_spark.functions.robotsx.robots_sitemaps`); the documents
they point at are either a ``<urlset>`` of page ``<loc>`` entries or a
``<sitemapindex>`` of child sitemap ``<loc>`` entries (sitemaps.org
protocol).  Extraction is the standard fast-path regex over ``<loc>``
elements — one codegen'd projection, no XML library on the executor hot
path (the INDEPENDENT golden model parses the same bodies with stdlib
ElementTree, so regex-vs-real-XML divergence would fail the oracle).

Documented subset: ``<loc>`` values are plain character data (the
protocol requires entity-escaped URLs; ``&amp;`` is unescaped here — the
only entity legal in a URL loc per the spec's allowed characters);
CDATA sections are out of scope.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_LOC_RE = r"(?is)<loc>\s*([^<]*?)\s*</loc>"
_URL_BLOCK_RE = r"(?is)<url[\s>].*?</url\s*>"
_LASTMOD_RE = r"(?is)<lastmod>\s*([^<]*?)\s*</lastmod>"
_PRIORITY_RE = r"(?is)<priority>\s*([^<]*?)\s*</priority>"


def sitemap_is_index(xml: Column) -> Column:
    """True when the document is a ``<sitemapindex>`` (child sitemaps),
    False for a ``<urlset>`` (page URLs)."""
    return xml.rlike(r"(?is)<\s*sitemapindex[\s>]")


def sitemap_locs(xml: Column) -> Column:
    """array<string> of ``<loc>`` values (whitespace-trimmed,
    ``&amp;``-unescaped, duplicates collapsed)."""
    raw = F.regexp_extract_all(xml, F.lit(_LOC_RE), 1)
    return F.array_distinct(
        F.transform(raw, lambda u: F.replace(u, F.lit("&amp;"), F.lit("&")))
    )


def sitemap_entries(xml: Column) -> Column:
    """array<struct<loc, lastmod, priority>> — one element per ``<url>``
    block of a ``<urlset>``, carrying the protocol's optional scheduling
    children: ``<lastmod>`` (W3C datetime, kept as a trimmed string —
    ISO-8601 ordering is lexicographic) and ``<priority>`` (0.0-1.0,
    relative crawl importance; absent -> NULL, the protocol's documented
    default of 0.5 is applied by the CONSUMER so "unset" stays
    observable).  Blocks without a ``<loc>`` are dropped; still one
    codegen'd projection, no executor-side XML library (the golden model
    cross-checks with stdlib ElementTree)."""
    blocks = F.regexp_extract_all(xml, F.lit(_URL_BLOCK_RE), 0)
    ent = F.transform(
        blocks,
        lambda b: F.struct(
            F.replace(
                F.regexp_extract(b, _LOC_RE, 1), F.lit("&amp;"), F.lit("&")
            ).alias("loc"),
            F.nullif(F.regexp_extract(b, _LASTMOD_RE, 1), F.lit("")
                     ).alias("lastmod"),
            F.nullif(F.regexp_extract(b, _PRIORITY_RE, 1), F.lit("")
                     ).cast("double").alias("priority"),
        ),
    )
    return F.filter(ent, lambda e: e["loc"] != "")


def loc_host_matches(loc: Column, host: Column) -> Column:
    """True iff ``loc`` belongs to ``host`` — a crawler must drop
    cross-host sitemap entries (sitemaps.org scope rule: a sitemap is
    only authoritative for URLs on its own host)."""
    return loc.rlike("(?i)^https?://") & (
        F.lower(F.regexp_extract(loc, r"(?i)^https?://([^/?#]*)", 1))
        == F.lower(host)
    )
