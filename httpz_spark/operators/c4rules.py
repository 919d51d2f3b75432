"""C4 cleaning rules (Raffel et al. 2019, "Exploring the Limits of
Transfer Learning", §2.2) — the line/page filter battery and the
three-sentence-span cross-corpus dedup that produced the C4 corpus.
Complements the Gopher battery (operators/textquality.py): Gopher scores
and gates whole documents; C4 edits them (drops lines / sentence spans).

All pure native expressions — higher-order array functions for the
line/span manipulation, one shuffle for the span first-occurrence rule —
and every formula is deliberately replayable in ANSI SQL for the DuckDB
oracle.  Sentence boundaries use the deterministic '. '-split rule (C4's
own splitter is likewise heuristic); rejoined text uses the same
separator, documented lossy for '!?' enders.

Scale notes (100 TB):
- ``c4_line_filters`` is map-only (no shuffle): split -> filter ->
  array_join inside one codegen'd projection.
- ``c4_span_dedup`` explodes ~n_sentences rows per doc and shuffles once
  on the span hash (16-byte key) for the first-occurrence window; the
  reassembly groupBy reuses the doc_id partitioning.  Nothing is
  all-pairs; memory per task is bounded by the largest single document.

Reference scope: the reference engine (httpz_scanner/scanner.py) stops at
capture; C4/Gopher cleaning is the training-data surface grafted on top
(SURVEY §2 Part C).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TERMINAL_PUNCT_RE = r'[.!?"]$'
_SPACE_RE = "[ \t]+"


def _line_word_count(line: Column) -> Column:
    norm = F.trim(F.regexp_replace(line, _SPACE_RE, " "))
    return F.when(norm == "", F.lit(0)).otherwise(F.size(F.split(norm, " ")))


def c4_line_filters(df: DataFrame, text_col: str = "text",
                    min_words: int = 3) -> DataFrame:
    """C4 line filters + page gates.

    Line keep rule (applied per '\\n' line): ends in terminal
    punctuation ``. ! ? "``, has >= ``min_words`` whitespace words, and
    does not mention 'javascript' (case-insensitive).  Page gates on the
    ORIGINAL text: no curly brace, no 'lorem ipsum'; and on the cleaned
    text: >= 5 sentence enders.

    Adds: ``clean_text`` (kept lines rejoined), ``n_lines``,
    ``n_lines_kept``, ``n_sentences``, ``has_brace``, ``has_lorem``,
    ``page_keep``.  Map-only, one projection.
    """
    lines = F.split(F.col(text_col), "\n")
    trimmed = F.transform(lines, lambda l: F.trim(l))
    kept = F.filter(
        trimmed,
        lambda l: l.rlike(TERMINAL_PUNCT_RE)
        & (_line_word_count(l) >= min_words)
        & ~F.contains(F.lower(l), F.lit("javascript")),
    )
    clean = F.array_join(kept, "\n")
    n_sent = F.regexp_count(clean, F.lit(r"[.!?]"))
    has_brace = F.contains(F.col(text_col), F.lit("{"))
    has_lorem = F.contains(F.lower(F.col(text_col)), F.lit("lorem ipsum"))
    return df.select(
        "*",
        clean.alias("clean_text"),
        F.size(lines).alias("n_lines"),
        F.size(kept).alias("n_lines_kept"),
        n_sent.alias("n_sentences"),
        has_brace.alias("has_brace"),
        has_lorem.alias("has_lorem"),
        ((n_sent >= 5) & ~has_brace & ~has_lorem).alias("page_keep"),
    )


def c4_span_dedup(df: DataFrame, text_col: str = "text",
                  key_col: str = "doc_id") -> DataFrame:
    """Cross-corpus three-sentence-span dedup (the C4 signature rule):
    any 3-consecutive-sentence span occurring more than once in the
    corpus keeps only its first occurrence (global (key, span_idx)
    order); every sentence covered by a later occurrence is dropped and
    the survivors are rejoined in order.

    Returns (key_col, dedup_text, n_sentences, n_sent_dropped).  One
    shuffle on the md5 span hash for the first-occurrence window; docs
    with < 3 sentences pass through untouched.

    Plan shape: the (key, sentences) frame is persisted (one evaluation
    of the upstream line-filter/gate expressions — the lazy form ran
    them once under the span subtree and once under the sentence
    subtree), duplicate spans collapse to a PER-DOC drop-index array
    (only docs that lose sentences have a row), and the surviving text
    is rebuilt natively with an index filter over the cached sentence
    array.  The old sentence-granular shape exploded every sentence,
    anti-joined the drop list, and re-assembled docs through a
    collect_list aggregation — three corpus-sized shuffles that all
    disappear (the rebuild join is corpus ⋈ dup-docs-only, left)."""
    sents = F.split(F.col(text_col), r"\. ")
    base = df.select(key_col, sents.alias("sents"),
                     F.size(sents).alias("n_sent")).persist()

    # span hashes: md5 of the 3-sentence window, one row per span
    span_idx = F.when(
        F.col("n_sent") >= 3, F.sequence(F.lit(0), F.col("n_sent") - 3)
    ).otherwise(F.array().cast("array<int>"))
    spans = base.select(
        key_col,
        F.posexplode(F.transform(
            span_idx,
            lambda i: F.md5(F.concat_ws(
                "|", F.slice(F.col("sents"), i + 1, 3))),
        )).alias("span_idx", "span_h"),
    )
    from pyspark.sql.window import Window as W

    first = F.row_number().over(
        W.partitionBy("span_h").orderBy(key_col, "span_idx"))
    dup_spans = (spans.withColumn("occ", first).filter(F.col("occ") > 1)
                 .select(key_col, "span_idx"))
    # (key, sorted distinct dropped-sentence indices) — rows only for
    # docs that actually lose sentences
    drops = dup_spans.groupBy(key_col).agg(
        F.array_sort(F.array_distinct(F.flatten(F.collect_list(
            F.array(F.col("span_idx"), F.col("span_idx") + 1,
                    F.col("span_idx") + 2))))).alias("_drop_idx"))

    kept_sents = F.when(
        F.col("_drop_idx").isNull(), F.col("sents")
    ).otherwise(
        F.filter(F.col("sents"),
                 lambda s, i: ~F.array_contains(F.col("_drop_idx"), i))
    )
    n_drop = F.coalesce(F.size("_drop_idx"), F.lit(0))
    return (base.join(drops, key_col, "left")
            .select(
                key_col,
                F.array_join(kept_sents, ". ").alias("dedup_text"),
                F.col("n_sent").alias("n_sentences"),
                n_drop.cast("int").alias("n_sent_dropped"),
            )
            # a doc whose every sentence was covered by duplicate spans
            # disappears from the output — the contract the old
            # sentence-anti-join shape established
            .filter(F.col("n_sentences") > F.col("n_sent_dropped")))


def c4_clean(df: DataFrame, text_col: str = "text",
             key_col: str = "doc_id", min_words: int = 3) -> DataFrame:
    """The full C4 pipeline: line filters -> page gates -> span dedup.
    Pages failing the gates are DROPPED (C4 removes them); surviving
    pages get their cleaned, span-deduped text."""
    lf = c4_line_filters(df, text_col=text_col, min_words=min_words)
    gated = lf.filter("page_keep").select(
        key_col, F.col("clean_text").alias("text"))
    return c4_span_dedup(gated, text_col="text", key_col=key_col)
