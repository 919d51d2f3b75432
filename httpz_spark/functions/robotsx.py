"""robots.txt parsing as native column expressions.

The north_rule's politeness layer consumes a robots table
(``host, crawl_delay_ms, per_wave_budget, disallow``) that
:mod:`httpz_spark.operators.politeness` enforces; this module is the
production *builder* side: turn fetched ``/robots.txt`` bodies into those
columns without leaving the JVM (regexp_replace/regexp_extract/
regexp_extract_all — one codegen'd projection, no UDF).

Implemented subset of the Robots Exclusion Protocol (RFC 9309), documented
so the politeness semantics downstream are unambiguous:

* the ``User-agent: *`` record is selected (group lines up to the next
  ``User-agent:`` record; consecutive ``User-agent`` lines immediately
  after the matched one share the record, per the RFC's group rules);
* ``Disallow:`` values are PATH PREFIXES — exactly what
  ``politeness.apply_politeness`` enforces via ``startswith`` (RFC
  wildcard ``*``/``$`` patterns are out of scope and documented as such);
  empty ``Disallow:`` (allow-all) contributes nothing;
* ``Crawl-delay:`` seconds (fractional ok) → milliseconds — a de-facto
  extension honored by major engines, absent from the RFC;
* ``#`` comments and CR line endings are stripped; directive names and the
  ``*`` agent match case-insensitively.

The reference scanner has no robots handling at all
(/root/reference/httpz_scanner/ — no robots mention); this is engine-new
surface mandated by the north_rule's "robots budgets".
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# the '*' record: the matched User-agent line, any IMMEDIATELY following
# User-agent lines (shared record), then every line up to the next
# User-agent line (stray blank lines inside don't terminate extraction —
# directives are pulled by their own anchored regexes, so a malformed
# rules-after-blank-line file degrades exactly like a strict parser that
# ignores them would... see module docstring for the supported subset)
_GROUP_RE = (
    r"(?ims)^user-agent:[ \t]*\*[ \t]*$"
    r"((?:\nuser-agent:[^\n]*)*(?:\n(?!user-agent:)[^\n]*)*)"
)


def robots_star_group(txt: Column) -> Column:
    """The raw rule block of the ``User-agent: *`` record ('' if none)."""
    cleaned = F.regexp_replace(
        F.regexp_replace(txt, "\r", ""), r"(?m)#[^\n]*", ""
    )
    return F.regexp_extract(cleaned, _GROUP_RE, 1)


def robots_disallow(txt: Column) -> Column:
    """array<string> of Disallow path prefixes from the ``*`` record."""
    return F.regexp_extract_all(
        robots_star_group(txt), F.lit(r"(?im)^disallow:[ \t]*(\S+)[ \t]*$"), 1
    )


def robots_crawl_delay_ms(txt: Column, default_ms: int = 1000) -> Column:
    """Crawl-delay of the ``*`` record in ms; ``default_ms`` if absent."""
    raw = F.regexp_extract(
        robots_star_group(txt), r"(?im)^crawl-delay:[ \t]*([0-9.]+)[ \t]*$", 1
    )
    return F.when(raw == "", F.lit(default_ms)).otherwise(
        F.round(raw.cast("double") * 1000).cast("int")
    )


def robots_columns(txt: Column, default_delay_ms: int = 1000) -> Column:
    """struct<crawl_delay_ms int, disallow array<string>> — parsed once.

    The shared group subtree is let-bound through a 1-element-array
    transform (Catalyst does no CSE across the extract calls' common
    ``robots_star_group`` regexes otherwise — same class as the
    word_shingles/winnow fix, here ~3 redundant big-regex passes/row)."""
    def _of(grp):
        delay_raw = F.regexp_extract(
            grp, r"(?im)^crawl-delay:[ \t]*([0-9.]+)[ \t]*$", 1
        )
        return F.struct(
            F.when(delay_raw == "", F.lit(default_delay_ms))
            .otherwise(F.round(delay_raw.cast("double") * 1000).cast("int"))
            .alias("crawl_delay_ms"),
            F.regexp_extract_all(
                grp, F.lit(r"(?im)^disallow:[ \t]*(\S+)[ \t]*$"), 1
            ).alias("disallow"),
        )

    return F.element_at(F.transform(F.array(robots_star_group(txt)), _of), 1)
