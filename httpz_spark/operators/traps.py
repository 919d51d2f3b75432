"""Crawler-trap detection: per-host URL-template explosion guard.

At north_rule scale (a 10^10-URL frontier) the classic failure mode is a
crawler trap: calendars, session-ids, faceted search and pagination mint
an unbounded URL space under one path shape, and a frontier without a
guard spends its entire budget inside one host's infinite corner.  The
reference scanner is seed-list-driven so it cannot loop this way
(/root/reference/httpz_scanner/scanner.py feeds fixed input files); a
frontier crawler re-discovers URLs, so the guard is a REQUIRED new
component, not a port.

Design (all native expressions — no Python in the hot path):

1. ``url_path_template`` collapses a URL's path to its shape: the query
   string and fragment drop, runs of hex (>= 8 chars, e.g. session ids
   and content hashes — long pure-digit runs also qualify: both are
   high-entropy tokens, and RE2-targeted portability rules out a
   lookahead that would insist on a letter) collapse to ``{H}`` and
   shorter digit runs to ``{N}`` — ``/cal/2026-03-05`` and
   ``/cal/1999-12-31`` are the SAME template ``/cal/{N}-{N}-{N}``.
2. ``trap_templates`` is ONE hash aggregation over (host, template)
   counting distinct URLs; templates above ``max_urls`` are traps.  At
   scale this is map-side combinable and shuffles only (host, template)
   pairs — far smaller than the frontier itself.
3. ``frontier_detrap`` keeps every URL of healthy templates untouched and
   caps trapped templates at ``keep`` URLs.  The trap list is tiny by
   construction (it is the HAVING > max_urls tail), so it rides a
   broadcast join; the rank window runs ONLY over rows of trapped
   templates (a vanishing fraction of the frontier), never globally.

Deterministic: the per-template survivors are the ``keep`` smallest URLs
in lexicographic order — reproducible across runs and engines, which the
REAL-SQL oracle (★trap_templates / ★frontier_detrap) checks row-for-row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# order matters: hex runs first (a hex run contains digit runs), then
# digit runs.  Mirrored verbatim in the DuckDB oracle (with the 'g' flag —
# Spark's regexp_replace is global by default, DuckDB's is not).
_SCHEME_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*"
_QUERY_FRAG_RE = r"[?#].*$"
_HEX_RUN_RE = r"[0-9a-f]{8,}"
_DIGIT_RUN_RE = r"[0-9]+"


def url_path_template(url: Column | str) -> Column:
    """The trap-detection shape of a URL's path (native expression)."""
    c = F.col(url) if isinstance(url, str) else url
    path = F.regexp_replace(
        F.regexp_replace(c, _SCHEME_HOST_RE, ""), _QUERY_FRAG_RE, ""
    )
    path = F.when(path == "", F.lit("/")).otherwise(path)
    return F.regexp_replace(
        F.regexp_replace(path, _HEX_RUN_RE, "{H}"), _DIGIT_RUN_RE, "{N}"
    )


def trap_templates(
    frontier: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
    max_urls: int = 1000,
) -> DataFrame:
    """(host, template, n_urls) for every template minting more than
    ``max_urls`` distinct URLs on one host — the trap list."""
    return (
        frontier.select(
            F.col(host_col).alias("host"),
            url_path_template(F.col(url_col)).alias("template"),
            F.col(url_col).alias("_u"),
        )
        .groupBy("host", "template")
        .agg(F.countDistinct("_u").alias("n_urls"))
        .filter(F.col("n_urls") > max_urls)
    )


def frontier_trap_split(
    frontier: DataFrame,
    traps: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
    keep: int = 64,
) -> tuple:
    """(passed, overflow) against a PRECOMPUTED trap list (host,
    template): rows of trapped templates beyond the first ``keep``
    (lexicographic URL order — deterministic) land in ``overflow`` with
    the frontier's ORIGINAL columns, so an engine can DEFER them to the
    next wave (throttle) instead of dropping them (blackhole); everything
    else passes.  Same plan shape as :func:`frontier_detrap`: broadcast
    trap join, rank window over the trapped subset only."""
    cols = frontier.columns
    t = frontier.withColumn("_tpl", url_path_template(F.col(url_col)))
    tr = F.broadcast(
        traps.select(F.col("host").alias("_th"),
                     F.col("template").alias("_ttpl"))
        .withColumn("_trap", F.lit(True))
    )
    j = t.join(
        tr,
        (t[host_col] == F.col("_th")) & (F.col("_tpl") == F.col("_ttpl")),
        "left",
    )
    passed_healthy = j.filter(F.col("_trap").isNull()).select(*cols)
    w = Window.partitionBy(host_col, "_tpl").orderBy(F.col(url_col))
    trapped = (
        j.filter(F.col("_trap").isNotNull())
        .withColumn("_rn", F.row_number().over(w))
    )
    passed = passed_healthy.unionByName(
        trapped.filter(F.col("_rn") <= keep).select(*cols))
    overflow = trapped.filter(F.col("_rn") > keep).select(*cols)
    return passed, overflow


def frontier_detrap(
    frontier: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
    max_urls: int = 1000,
    keep: int = 64,
    traps: DataFrame | None = None,
) -> DataFrame:
    """Frontier with trapped templates capped at ``keep`` URLs each.

    Healthy templates pass through untouched; rows of trapped templates
    are ranked (lexicographic URL order — deterministic) and only the
    first ``keep`` survive, with a ``trapped`` flag so lineage records
    the intervention.  Plan shape: the window runs ONLY over the trapped
    subset (never the full frontier — that shuffle is the thing this
    operator exists to avoid), and although the union's two branches each
    reference the trap aggregation, it sits inside an identical broadcast
    exchange, so Spark's ReuseExchange rule evaluates it once (asserted
    by tests/test_traps.py).  Callers that already hold a trap list from
    a previous wave (streaming) pass it via ``traps`` and skip the
    aggregation entirely.
    """
    t = frontier.withColumn("template", url_path_template(F.col(url_col)))
    if traps is None:
        traps = trap_templates(frontier, url_col, host_col, max_urls)
    traps = F.broadcast(
        traps.select("host", "template").withColumn("_trap", F.lit(True))
    )
    j = t.join(traps, ["host", "template"], "left")
    healthy = j.filter(F.col("_trap").isNull()).drop("_trap").withColumn(
        "trapped", F.lit(False)
    )
    w = Window.partitionBy("host", "template").orderBy(F.col(url_col))
    capped = (
        j.filter(F.col("_trap").isNotNull())
        .drop("_trap")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= keep)
        .drop("_rn")
        .withColumn("trapped", F.lit(True))
    )
    return healthy.unionByName(capped)
