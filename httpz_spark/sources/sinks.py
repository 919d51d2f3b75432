"""Result sinks (SURVEY §2 A3/A4).

* JSONL: the reference appends ``json.dumps(result)`` per row
  (``cli.py:140,168-172``) where absent fields are absent keys.  Spark's
  ``write.json`` drops null fields by default (``ignoreNullFields``), which
  reproduces the dict shape; ``to_jsonl_column`` gives the same string as a
  column for byte-level parity diffs.
* console: colored single-line render (``formatters.py:9-106``) is
  presentation-only — reproduced as a native ``format_string`` expression
  (no ANSI; the engine is not a terminal program).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

RESULT_FIELDS_ORDER = [
    "domain", "url", "status", "protocol", "response_headers", "content_type",
    "content_length", "content_length_raw", "redirect_chain", "cname_chain",
    "title", "body_preview", "body_clean", "favicon_hash", "ips", "tls",
    "error", "error_type",
]


def to_jsonl_column(df: DataFrame) -> Column:
    """One JSON string per result row; null fields dropped (dict-shape
    parity with cli.py:168-172)."""
    cols = [c for c in RESULT_FIELDS_ORDER if c in df.columns]
    return F.to_json(F.struct(*cols), {"ignoreNullFields": "true"})


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    cols = [c for c in RESULT_FIELDS_ORDER if c in df.columns]
    df.select(*cols).write.mode(mode).option("ignoreNullFields", "true").json(path)


def console_line(df: DataFrame) -> Column:
    """Single-line console render (formatters.py shape, sans ANSI):
    ``status proto://domain [title] [error]``."""
    return F.format_string(
        "%4d %s %s%s%s",
        F.coalesce(F.col("status"), F.lit(-1)),
        F.coalesce(F.col("protocol"), F.lit("?")),
        F.coalesce(F.col("domain"), F.lit("")),
        F.when(F.col("title").isNotNull(), F.concat(F.lit("  [") , F.col("title"), F.lit("]"))).otherwise(F.lit("")),
        F.when(F.col("error").isNotNull(), F.concat(F.lit("  !"), F.col("error_type"))).otherwise(F.lit("")),
    )


# ---------------------------------------------------------------------------
# colored console formatter (A4) — formatters.py:9-106 re-expressed as ONE
# native Catalyst expression (no python per row).  ANSI codes are standard
# terminal escapes; segment order/filters/gating mirror the reference.
# ---------------------------------------------------------------------------

class Ansi:
    """Standard ANSI escape codes (public terminal spec)."""

    GREEN = "\033[92m"
    YELLOW = "\033[93m"
    RED = "\033[91m"
    BLUE = "\033[94m"
    CYAN = "\033[96m"
    PURPLE = "\033[35m"
    PINK = "\033[38;5;198m"
    DARK_GREEN = "\033[38;5;22m"
    RESET = "\033[0m"


def _seg(color: str, body: Column) -> Column:
    return F.concat(F.lit(color + "["), body, F.lit("]" + Ansi.RESET))


DEFAULT_SHOW = {"status_code": True, "title": True}


def console_line_colored(
    df: DataFrame,
    show_fields: dict | None = None,
    debug: bool = False,
    match_codes=None,
    exclude_codes=None,
) -> Column:
    """Colored single-line render of a result row (formatters.py:9-106):
    returns '' for rows the reference would skip (error rows without
    debug, match/exclude filtered).  Same segment order and color classes:
    status (green 2xx / yellow 3xx / red else), [url|domain], error,
    content_type, human_size(content_length), title, body preview (100
    chars + '...'), CNAME chain, IPs, favicon, headers, redirects, TLS."""
    from httpz_spark.functions.text import human_size

    show = DEFAULT_SHOW if show_fields is None else show_fields
    cols = set(df.columns)

    def has(c):
        return c in cols

    status = F.coalesce(F.col("status"), F.lit(-1))
    parts = []
    if show.get("status_code"):
        color = (
            F.when((status >= 200) & (status < 300), F.lit(Ansi.GREEN))
            .when((status >= 300) & (status < 400), F.lit(Ansi.YELLOW))
            .otherwise(F.lit(Ansi.RED))
        )
        parts.append(F.concat(color, F.lit("["), status.cast("string"),
                              F.lit("]" + Ansi.RESET)))
    url_or_domain = F.coalesce(
        *( [F.col("url")] if has("url") else [] ),
        *( [F.col("domain")] if has("domain") else [] ),
        F.lit(""),
    )
    parts.append(F.concat(F.lit("["), url_or_domain, F.lit("]")))
    if debug and has("error"):
        parts.append(
            F.when(
                (status < 0) & F.col("error").isNotNull(),
                _seg(Ansi.RED, F.concat(
                    F.coalesce(F.col("error_type"), F.lit("")), F.lit(": "),
                    F.col("error"))),
            ).otherwise(F.lit(None))
        )
    if show.get("content_type") and has("content_type"):
        parts.append(F.when(F.col("content_type").isNotNull(),
                            _seg(Ansi.CYAN, F.col("content_type"))))
    if show.get("content_length") and has("content_length"):
        parts.append(F.when(F.col("content_length").isNotNull(),
                            _seg(Ansi.PINK, human_size(F.col("content_length")))))
    if show.get("title") and has("title"):
        parts.append(F.when(F.col("title").isNotNull(),
                            _seg(Ansi.DARK_GREEN, F.col("title"))))
    if show.get("body") and has("body_clean"):
        body = F.coalesce(F.col("body_clean"),
                          F.col("body_preview") if has("body_preview") else F.lit(None))
        preview = F.concat(
            F.substring(body, 1, 100),
            F.when(F.length(body) > 100, F.lit("...")).otherwise(F.lit("")),
        )
        parts.append(F.when(body.isNotNull(), _seg(Ansi.BLUE, preview)))
    if show.get("cname") and has("cname_chain"):
        parts.append(F.when(
            F.col("cname_chain").isNotNull() & (F.size("cname_chain") > 0),
            _seg(Ansi.PURPLE, F.concat(F.lit("CNAME: "),
                                       F.array_join("cname_chain", " -> ")))))
    if show.get("ip") and has("ips"):
        parts.append(F.when(
            F.col("ips").isNotNull() & (F.size("ips") > 0),
            _seg(Ansi.YELLOW, F.array_join("ips", ", "))))
    if show.get("favicon") and has("favicon_hash"):
        parts.append(F.when(F.col("favicon_hash").isNotNull(),
                            _seg(Ansi.PURPLE, F.col("favicon_hash"))))
    if show.get("headers") and has("response_headers"):
        hdrs = F.array_join(
            F.transform(
                F.map_entries("response_headers"),
                lambda e: F.concat(e.getField("key"), F.lit(": "), e.getField("value")),
            ), ", ")
        parts.append(F.when(F.col("response_headers").isNotNull(),
                            _seg(Ansi.CYAN, hdrs)))
    if show.get("follow_redirects") and has("redirect_chain"):
        parts.append(F.when(
            F.col("redirect_chain").isNotNull() & (F.size("redirect_chain") > 0),
            _seg(Ansi.YELLOW, F.concat(F.lit("Redirects: "),
                                       F.array_join("redirect_chain", " -> ")))))
    if show.get("tls") and has("tls"):
        t = F.col("tls")
        tls_parts = F.array_compact(F.array(
            F.when(t.getField("subject").isNotNull(),
                   F.concat(F.lit("Subject: "), t.getField("subject"))),
            F.when(t.getField("issuer").isNotNull(),
                   F.concat(F.lit("Issuer: "), t.getField("issuer"))),
            F.when(t.getField("email").isNotNull(),
                   F.concat(F.lit("Email: "), t.getField("email"))),
            F.when(t.getField("fingerprint").isNotNull(),
                   F.concat(F.lit("Fingerprint: "),
                            F.substring(t.getField("fingerprint"), 1, 16),
                            F.lit("..."))),
        ))
        parts.append(F.when(
            t.isNotNull() & (F.size(tls_parts) > 0),
            _seg(Ansi.GREEN, F.array_join(tls_parts, " | "))))

    line = F.array_join(F.array_compact(F.array(*parts)), " ")
    keep = F.lit(True) if debug else (status >= 0)
    if match_codes:
        keep = keep & status.isin(sorted(match_codes))
    if exclude_codes:
        keep = keep & ~status.isin(sorted(exclude_codes))
    return F.when(keep, line).otherwise(F.lit(""))
