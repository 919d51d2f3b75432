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


def _gram_counts(docs: DataFrame, n: int, text_col: str, id_col: str) -> DataFrame:
    """(id, _nchars, gram, _c) — word n-gram occurrence counts per doc
    (explode + one map-side-combined groupBy; docs with < n words emit a
    single NULL gram so every doc survives to the signal join)."""
    norm = normalize_ws_ascii(F.col(text_col))
    words_expr = F.split(norm, " ")

    def _grams(words):
        sz = F.size(words)
        idxs = F.sequence(F.lit(0), F.greatest(sz - n, F.lit(0)))
        return F.when(
            sz >= n,
            F.transform(idxs, lambda i: F.concat_ws(" ", F.slice(words, i + 1, n))),
        ).otherwise(F.array().cast("array<string>"))

    grams = F.element_at(F.transform(F.array(words_expr), _grams), 1)
    g = docs.select(
        F.col(id_col).alias("id"),
        F.length(norm).alias("_nchars"),
        F.explode_outer(grams).alias("gram"),
    )
    return g.groupBy("id", "_nchars", "gram").agg(F.count("*").alias("_c"))


def top_ngram_char_frac(docs: DataFrame, n: int = 2, text_col: str = "text",
                        id_col: str = "doc_id",
                        out_col: str | None = None) -> DataFrame:
    """(id, <out_col>) — characters covered by each doc's MOST FREQUENT
    word n-gram: ``count * len(gram) / len(norm)``; ties break to the
    lexicographically smallest gram (deterministic).  Docs with < n
    words get 0.0.  Gopher applies this for n = 2, 3, 4."""
    from pyspark.sql.window import Window

    out_col = out_col or f"top_{n}gram_char_frac"
    counts = _gram_counts(docs, n, text_col, id_col)
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
        ).alias(out_col),
    )


def top_bigram_char_frac(docs: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id") -> DataFrame:
    """Backward-compatible alias: n=2 of :func:`top_ngram_char_frac`."""
    return top_ngram_char_frac(docs, 2, text_col, id_col,
                               out_col="top_bigram_char_frac")


def dup_ngram_char_frac(docs: DataFrame, n: int = 5, text_col: str = "text",
                        id_col: str = "doc_id",
                        out_col: str | None = None) -> DataFrame:
    """(id, <out_col>) — fraction of characters carried by DUPLICATED
    word n-grams: ``min(1, sum over grams with count>1 of count*len(gram)
    / len(norm))`` (occurrences may overlap, hence the cap — the
    documented convention; Gopher applies this for n = 5..10).  Docs with
    < n words get 0.0."""
    out_col = out_col or f"dup_{n}gram_char_frac"
    counts = _gram_counts(docs, n, text_col, id_col)
    agg = counts.groupBy("id", "_nchars").agg(
        F.sum(
            F.when(
                F.col("gram").isNotNull() & (F.col("_c") > 1),
                F.col("_c") * F.length("gram"),
            ).otherwise(F.lit(0))
        ).alias("_dupchars")
    )
    return agg.select(
        "id",
        F.round(
            F.when(F.col("_nchars") == 0, F.lit(0.0)).otherwise(
                F.least(
                    F.lit(1.0),
                    F.col("_dupchars") / F.col("_nchars").cast("double"),
                )
            ),
            6,
        ).alias(out_col),
    )


def gopher_quality_signals(docs: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id",
                           top_ns: tuple = (2, 3, 4),
                           dup_ns: tuple = (5,)) -> DataFrame:
    """All signals as one frame: per-row natives + one aggregation join
    per n-gram signal (Gopher's full repetition battery is top 2/3/4-gram
    + dup 5..10-gram; the defaults compute 2/3/4 + 5 — pass wider tuples
    for the complete set).  The n=2 column keeps its historical name
    ``top_bigram_char_frac``."""
    out = docs.select(
        F.col(id_col).alias("id"),
        gopher_row_signals(F.col(text_col)).alias("s"),
    ).select("id", "s.*")
    for n in top_ns:
        col = "top_bigram_char_frac" if n == 2 else None
        out = out.join(top_ngram_char_frac(docs, n, text_col, id_col,
                                           out_col=col), "id")
    for n in dup_ns:
        out = out.join(dup_ngram_char_frac(docs, n, text_col, id_col), "id")
    return out


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
    max_top_3gram_char_frac: float = 0.18,
    max_top_4gram_char_frac: float = 0.16,
    max_dup_5gram_char_frac: float = 0.15,
    min_stop_word_hits: int = 2,
) -> DataFrame:
    """Adds ``keep boolean`` per the (parameterized) Gopher thresholds.
    N-gram thresholds apply only when their column is present, so callers
    of :func:`gopher_quality_signals` with narrower ``top_ns``/``dup_ns``
    still compose."""
    c = F.col
    keep = (
        c("n_words").between(min_words, max_words)
        & c("mean_word_len").between(min_mean_word_len, max_mean_word_len)
        & (c("alpha_word_frac") >= min_alpha_word_frac)
        & (c("bullet_line_frac") <= max_bullet_line_frac)
        & (c("ellipsis_line_frac") <= max_ellipsis_line_frac)
        & (c("dup_line_frac") <= max_dup_line_frac)
        & (c("dup_line_char_frac") <= max_dup_line_char_frac)
        & (c("stop_word_hits") >= min_stop_word_hits)
    )
    for col, thr in (("top_bigram_char_frac", max_top_bigram_char_frac),
                     ("top_3gram_char_frac", max_top_3gram_char_frac),
                     ("top_4gram_char_frac", max_top_4gram_char_frac),
                     ("dup_5gram_char_frac", max_dup_5gram_char_frac)):
        if col in signals.columns:
            keep = keep & (c(col) <= thr)
    return signals.withColumn("keep", keep)
