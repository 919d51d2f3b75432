"""Recrawl scheduling: sitemap freshness signals vs the seen table.

A production crawl at north_rule scale is not one-shot: the frontier is
re-seeded from sitemaps on a cadence, and the scheduler must decide which
already-seen URLs are worth refetching.  The sitemap protocol's
``<lastmod>`` is exactly that signal: a seed row whose advertised lastmod
is NEWER than what the engine recorded at its last fetch is STALE and
re-enters the frontier; a never-seen loc is NEW; everything else is
FRESH and stays out (the expensive 99% at steady state).

Spark shape: one left join of the (small, per-host-bounded) seed frame
against the seen-meta table on the canonical URL — no full-corpus scan,
no window.  Deterministic; REAL-SQL-oracled (★recrawl_candidates).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def recrawl_candidates(
    seeds: DataFrame,
    seen_meta: DataFrame | None,
    url_col: str = "loc",
    seen_url_col: str = "url",
    seen_lastmod_col: str = "lastmod",
) -> DataFrame:
    """Classify sitemap seed rows against the seen table: adds
    ``recrawl_reason`` (``new`` — never fetched; ``stale`` — advertised
    lastmod is strictly newer than the recorded one, or the record has
    none) and DROPS fresh rows.

    Comparison is lexicographic on the W3C datetime strings (ISO-8601
    orders correctly); a seed row with no ``lastmod`` can never be stale
    — without a freshness claim a seen URL stays seen (re-crawling it is
    a cadence policy, not a signal).  ``seen_meta=None`` (cold start)
    marks everything ``new``.
    """
    if seen_meta is None:
        return seeds.withColumn("recrawl_reason", F.lit("new"))
    sm = seen_meta.select(
        F.col(seen_url_col).alias("_su"),
        F.col(seen_lastmod_col).alias("_slm"),
    )
    j = seeds.join(sm, seeds[url_col] == F.col("_su"), "left")
    new = F.col("_su").isNull()
    stale = (~new) & F.col("lastmod").isNotNull() & (
        F.col("_slm").isNull() | (F.col("lastmod") > F.col("_slm"))
    )
    return (
        j.withColumn(
            "recrawl_reason",
            F.when(new, F.lit("new")).when(stale, F.lit("stale")),
        )
        .filter(F.col("recrawl_reason").isNotNull())
        .drop("_su", "_slm")
    )
