"""Text analysis operators — language ID, quality scoring, token counting,
document fingerprinting.  All pure native expressions (whole-stage codegen);
formulas are deliberately SQL-expressible so the DuckDB oracle can replay
them exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from httpz_spark.functions.text import normalize_ws_ascii

# tiny marker-word lists for the n-gram/stopword language heuristic
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "ist", "das"],
    "es": ["el", "la", "los", "es", "una"],
    "fr": ["le", "la", "les", "est", "une"],
}


def token_count(text: Column) -> Column:
    """Whitespace token count on normalized text."""
    norm = normalize_ws_ascii(text)
    return F.when(norm == "", F.lit(0)).otherwise(F.size(F.split(norm, " ")))


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-flavored token estimate: word-pieces + punctuation as separate
    tokens (regexp_count is native)."""
    return F.regexp_count(text, F.lit(r"[A-Za-z0-9]{1,4}|[^A-Za-z0-9\s]"))


def punct_ratio(text: Column) -> Column:
    n_punct = F.length(text) - F.length(F.regexp_replace(text, r"[.,!?;:'\"()\[\]-]", ""))
    return n_punct.cast("double") / F.greatest(F.length(text), F.lit(1)).cast("double")


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    words = F.split(normalize_ws_ascii(F.lower(text)), " ")
    markers = LANG_MARKERS[lang]
    n_stop = F.size(F.filter(words, lambda w: w.isin(markers)))
    return n_stop.cast("double") / F.greatest(F.size(words), F.lit(1)).cast("double")


def quality_score(text: Column) -> Column:
    """Deterministic [0,1] quality heuristic: length band + punctuation
    sanity + stopword presence.  Formula chosen to be replayable in ANSI
    SQL for the oracle."""
    n = F.length(text)
    len_score = F.when((n >= 100) & (n <= 2000), 1.0).when(n > 2000, 0.7).otherwise(
        n.cast("double") / 100.0
    )
    p = punct_ratio(text)
    punct_score = F.when(p <= 0.1, 1.0).otherwise(F.greatest(F.lit(0.0), 1.0 - (p - 0.1) * 5.0))
    s = stopword_ratio(text)
    stop_score = F.least(F.lit(1.0), s * 10.0)
    return F.round((len_score * 0.4 + punct_score * 0.3 + stop_score * 0.3), 6)


def lang_id(text: Column) -> Column:
    """Stopword-count argmax across the marker table; 'und' (undetermined)
    when no markers hit.  Deterministic tie-break by language order."""
    words = F.split(normalize_ws_ascii(F.lower(text)), " ")

    # NB: a 2-arg lambda would be treated as (element, index) by F.filter —
    # bind the marker list through a 1-arg closure factory instead
    def _count(markers):
        return F.size(F.filter(words, lambda w: w.isin(markers)))

    counts = {lang: _count(m) for lang, m in LANG_MARKERS.items()}
    best = F.greatest(*counts.values())
    expr = F.lit("und")
    for lang in reversed(list(LANG_MARKERS)):  # earlier langs win ties
        expr = F.when((counts[lang] == best) & (best > 0), F.lit(lang)).otherwise(expr)
    return expr


def doc_fingerprint(text: Column) -> Column:
    """64-bit content fingerprint of the normalized text (xxhash64 —
    native)."""
    return F.xxhash64(normalize_ws_ascii(text))


def winnow_fingerprints(text: Column, k: int = 8, window: int = 4,
                        max_chars: int | None = 8192) -> Column:
    """Winnowing fingerprint set (Schleimer/Wilkerson/Aiken, SIGMOD'03 —
    the rolling-hash document-fingerprint scheme): hash every char k-gram
    of the normalized lowercase text, keep the MINIMUM hash of each sliding
    window of ``window`` consecutive k-gram hashes, return the distinct
    kept hashes sorted.  Guarantees: any shared substring of length
    ``k + window - 1`` between two documents yields at least one shared
    fingerprint, while storing only ~2/(window+1) of all k-gram hashes.

    Entirely native array expressions (sequence/transform/slice/array_min)
    — one codegen'd projection, no UDF, no shuffle.

    ``max_chars`` bounds the per-row working set: fingerprinting covers the
    first ``max_chars`` raw chars (documented prefix semantics — the same
    trade the reference makes with its 1 MiB body cap,
    /root/reference/httpz_scanner/parsers.py:34), so a multi-MiB document
    costs O(max_chars), not O(len).  Pass ``None`` for unbounded text.

    Shared subtrees (the normalized text, the k-gram hash array) are
    let-bound via 1-element-array ``transform``s: Catalyst does NOT do
    common-subexpression elimination across lambda boundaries, so the naive
    nesting re-evaluates the normalize regex once per array ELEMENT —
    quadratic per row (measured: a 1 MiB doc never finished; engine-sized
    300-char texts just hid it)."""
    if max_chars is not None:
        text = F.substring(text, 1, max_chars)
    norm_expr = normalize_ws_ascii(F.lower(text))

    def _wins_of(hs):
        n_wins = F.greatest(F.size(hs) - F.lit(window - 1), F.lit(1))
        return F.array_sort(F.array_distinct(F.transform(
            F.sequence(F.lit(1), n_wins),
            lambda j: F.array_min(F.slice(hs, j, window)),
        )))

    def _winnow_of(nrm):
        n_grams = F.greatest(F.length(nrm) - F.lit(k - 1), F.lit(1))
        hashes = F.transform(
            F.sequence(F.lit(1), n_grams),
            lambda i: F.xxhash64(F.substr(nrm, i, F.lit(k))),
        )
        # bind the hash array once before the sliding-window pass
        return F.element_at(F.transform(F.array(hashes), _wins_of), 1)

    # bind the normalized text once before the k-gram pass
    return F.element_at(F.transform(F.array(norm_expr), _winnow_of), 1)


def text_stats(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    t = F.col(text_col)
    return docs.select(
        F.col(id_col),
        token_count(t).alias("n_tokens"),
        bpe_ish_token_count(t).alias("n_bpe_tokens"),
        F.round(punct_ratio(t), 6).alias("punct_ratio"),
        F.round(stopword_ratio(t), 6).alias("stopword_ratio"),
        quality_score(t).alias("quality"),
        lang_id(t).alias("lang_pred"),
        doc_fingerprint(t).alias("fingerprint"),
    )
