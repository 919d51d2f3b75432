"""Gopher-style document quality + repetition signals (Rae et al.,
"Scaling Language Models: Methods, Analysis & Insights from Training
Gopher", 2021, §A1.1 — the rule family RefinedWeb/RedPajama/Dolma reuse).

Everything except the top-bigram signal is a pure per-row native
expression (whole-stage codegen, no shuffle); the top-bigram fraction is
an explode + per-doc aggregation — the scale shape for "most common
n-gram per document" at corpus size (one shuffle on doc_id, map-side
combined).  Every formula is deliberately ANSI-SQL-replayable so the
DuckDB oracle checks values exactly (★gopher_quality).

Signal definitions (documented precisely, so downstream thresholds mean
the same thing on both sides):

* ``n_words`` / ``mean_word_len`` — whitespace tokens of the normalized
  text; mean length computed arithmetically as
  ``(len(norm) - (n_words - 1)) / n_words`` (single-space normalization
  makes this exactly the average word length).
* ``alpha_word_frac`` — fraction of words containing at least one
  [A-Za-z].
* ``bullet_line_frac`` / ``ellipsis_line_frac`` — fraction of non-blank
  RAW-text lines starting with a bullet (``-``, ``*``, ``•`` after
  optional indent) / ending with ``...`` or ``…``.
* ``dup_line_frac`` — 1 − distinct/total over non-blank lines.
* ``dup_line_char_frac`` — fraction of non-blank-line characters carried
  by repeated line occurrences: 1 − chars(distinct lines)/chars(all
  lines).
* ``top_bigram_char_frac`` — characters covered by the most frequent
  word 2-gram: ``count * len(gram) / len(norm)``; ties break to the
  lexicographically smallest gram (deterministic).
* ``stop_word_hits`` — occurrences of Gopher's 8 stop words
  (the, be, to, of, and, that, have, with).

``gopher_keep`` applies the published thresholds (parameterized).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from httpz_spark.functions.text import normalize_ws_ascii

GOPHER_STOP_WORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def _nonblank_lines(text: Column) -> Column:
    return F.filter(F.split(text, "\n"), lambda l: F.trim(l) != "")


def gopher_row_signals(text: Column) -> Column:
    """struct of all per-row signals (everything except the bigram)."""
    norm = normalize_ws_ascii(text)

    def _of(args):
        n, lines = args.getField("norm"), args.getField("lines")
        words = F.split(n, " ")
        n_words = F.when(n == "", F.lit(0)).otherwise(F.size(words))
        mean_word_len = F.when(n_words == 0, F.lit(0.0)).otherwise(
            (F.length(n) - (n_words - 1)).cast("double") / n_words
        )
        alpha = F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
        alpha_frac = F.when(n_words == 0, F.lit(0.0)).otherwise(
            alpha.cast("double") / n_words
        )
        n_lines = F.size(lines)
        bullet = F.size(F.filter(lines, lambda l: l.rlike(r"^\s*[-*•]")))
        ellipsis = F.size(
            F.filter(lines, lambda l: l.rlike(r"(\.\.\.|…)\s*$"))
        )
        line_frac = lambda c: F.when(n_lines == 0, F.lit(0.0)).otherwise(  # noqa: E731
            c.cast("double") / n_lines
        )
        total_chars = F.aggregate(
            lines, F.lit(0), lambda acc, l: acc + F.length(l)
        )
        distinct_chars = F.aggregate(
            F.array_distinct(lines), F.lit(0), lambda acc, l: acc + F.length(l)
        )
        dup_line_frac = F.when(n_lines == 0, F.lit(0.0)).otherwise(
            1.0 - F.size(F.array_distinct(lines)).cast("double") / n_lines
        )
        dup_char_frac = F.when(total_chars == 0, F.lit(0.0)).otherwise(
            1.0 - distinct_chars.cast("double") / total_chars
        )
        low_words = F.split(F.lower(n), " ")
        stop_hits = F.size(
            F.filter(low_words, lambda w: w.isin(GOPHER_STOP_WORDS))
        )
        return F.struct(
            n_words.alias("n_words"),
            F.round(mean_word_len, 6).alias("mean_word_len"),
            F.round(alpha_frac, 6).alias("alpha_word_frac"),
            F.round(line_frac(bullet), 6).alias("bullet_line_frac"),
            F.round(line_frac(ellipsis), 6).alias("ellipsis_line_frac"),
            F.round(dup_line_frac, 6).alias("dup_line_frac"),
            F.round(dup_char_frac, 6).alias("dup_line_char_frac"),
            stop_hits.alias("stop_word_hits"),
        )

    # let-bind norm + lines: both feed several signals, and Catalyst does
    # no CSE across HOF lambda boundaries (the word_shingles/winnow bug
    # class — the normalize regex would otherwise re-run per signal)
    bound = F.struct(norm.alias("norm"), _nonblank_lines(text).alias("lines"))
    return F.element_at(F.transform(F.array(bound), _of), 1)


def top_bigram_char_frac(docs: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id") -> DataFrame:
    """(id, top_bigram_char_frac) — the repetition signal that needs an
    aggregation: explode word 2-grams, count per (doc, gram), keep each
    doc's max count with the lexicographically smallest gram on ties.
    Docs with < 2 words get 0.0."""
    from pyspark.sql.window import Window

    norm = normalize_ws_ascii(F.col(text_col))
    words_expr = F.split(norm, " ")

    def _grams(words):
        n = F.size(words)
        idxs = F.sequence(F.lit(0), F.greatest(n - 2, F.lit(0)))
        return F.when(
            n >= 2,
            F.transform(idxs, lambda i: F.concat_ws(" ", F.slice(words, i + 1, 2))),
        ).otherwise(F.array().cast("array<string>"))

    grams = F.element_at(F.transform(F.array(words_expr), _grams), 1)
    g = docs.select(
        F.col(id_col).alias("id"),
        F.length(norm).alias("_nchars"),
        F.explode_outer(grams).alias("gram"),
    )
    counts = g.groupBy("id", "_nchars", "gram").agg(F.count("*").alias("_c"))
    w = Window.partitionBy("id").orderBy(
        F.col("_c").desc(), F.col("gram").asc_nulls_last()
    )
    top = counts.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1)
    return top.select(
        "id",
        F.round(
            F.when(
                F.col("gram").isNull() | (F.col("_nchars") == 0), F.lit(0.0)
            ).otherwise(
                F.col("_c") * F.length("gram")
                / F.col("_nchars").cast("double")
            ),
            6,
        ).alias("top_bigram_char_frac"),
    )


def gopher_quality_signals(docs: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id") -> DataFrame:
    """All signals as one frame: per-row natives + the bigram join."""
    row = docs.select(
        F.col(id_col).alias("id"),
        gopher_row_signals(F.col(text_col)).alias("s"),
    ).select("id", "s.*")
    bg = top_bigram_char_frac(docs, text_col, id_col)
    return row.join(bg, "id")


def gopher_keep(
    signals: DataFrame,
    min_words: int = 50, max_words: int = 100_000,
    min_mean_word_len: float = 3.0, max_mean_word_len: float = 10.0,
    min_alpha_word_frac: float = 0.80,
    max_bullet_line_frac: float = 0.90,
    max_ellipsis_line_frac: float = 0.30,
    max_dup_line_frac: float = 0.30,
    max_dup_line_char_frac: float = 0.20,
    max_top_bigram_char_frac: float = 0.20,
    min_stop_word_hits: int = 2,
) -> DataFrame:
    """Adds ``keep boolean`` per the (parameterized) Gopher thresholds."""
    c = F.col
    keep = (
        c("n_words").between(min_words, max_words)
        & c("mean_word_len").between(min_mean_word_len, max_mean_word_len)
        & (c("alpha_word_frac") >= min_alpha_word_frac)
        & (c("bullet_line_frac") <= max_bullet_line_frac)
        & (c("ellipsis_line_frac") <= max_ellipsis_line_frac)
        & (c("dup_line_frac") <= max_dup_line_frac)
        & (c("dup_line_char_frac") <= max_dup_line_char_frac)
        & (c("top_bigram_char_frac") <= max_top_bigram_char_frac)
        & (c("stop_word_hits") >= min_stop_word_hits)
    )
    return signals.withColumn("keep", keep)
