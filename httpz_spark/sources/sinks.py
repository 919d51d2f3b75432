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
