"""ExactSubstr deduplication — Lee et al. (ACL 2022), "Deduplicating
Training Data Makes Language Models Better": remove every span of at
least ``window_tokens`` tokens that occurs verbatim more than once in
the corpus, cutting the span out of the documents rather than dropping
whole documents.

The paper builds one suffix array over the concatenated corpus; that is
inherently single-machine.  The Spark-first equivalent rests on a
window identity: a token is inside a duplicated >=L-token span **iff**
some exactly-L-token window containing it occurs >=2 times corpus-wide
(any duplicated span of length >= L is covered by its own duplicated
L-windows).  So the operator is:

1. explode every L-token rolling window as ``(doc, pos, md5(window))``
   — md5's 128 bits make key collisions ignorable at any corpus size,
   and fixed-width keys shuffle far cheaper than 50-token strings;
2. ``groupBy(key).count()`` to find duplicated windows — the count
   aggregation is **map-side combined, so degenerate hot windows
   (boilerplate, repeated-token runs) collapse before the shuffle**;
   the positions are then recovered with an equi-join (AQE skew-split
   handles the join side) rather than a per-key ``collect_list`` that
   a hot key could blow up;
3. merge each doc's marked positions into maximal spans with the
   gaps-and-islands window (partitioned by doc — no global order);
4. rebuild the cleaned text natively: keep tokens not covered by any
   merged span (index-aware ``filter`` over the token array, existence
   check against the few merged spans).

``keep_first`` exempts the globally-first occurrence (min
``struct(doc, pos)``) of each duplicated window — the paper's "remove
all but one copy" reading; the default removes every occurrence, which
is what the released deduplicate-text-datasets tool does.

Docs shorter than ``window_tokens`` produce no windows and pass through
unchanged.  Text is the whitespace-normalized lowered token stream (the
same substrate as the other dedup operators), so ``clean_text`` of an
untouched doc equals its normalized text.

Reference analogue: none (the httpz scanner has no dedup surface);
training-data-pipeline operator (SURVEY.md §2 training-data family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from httpz_spark.functions.text import tokens_of


def _tokenized(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """``(id, t)`` — the normalized token array, PROJECTED so downstream
    lambdas reference a column attribute (Catalyst re-evaluates outer
    expressions inside lambda bodies per element; a projected column is
    free)."""
    return docs.select(
        F.col(id_col).alias("id"), tokens_of(F.col(text_col)).alias("t")
    )


def token_windows(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window_tokens: int = 50,
) -> DataFrame:
    """``(id, pos, wkey)`` — every rolling ``window_tokens``-token window
    keyed by xxhash64 of the space-joined window text (an 8-byte shuffle
    key — a quarter of the old md5-hex string — and a far cheaper hash
    per position; the dedup identity tolerates the 2^-64 collision class
    exactly like the repo's other hash-keyed operators, and the oracle
    compares raw gram strings so the engine-side key choice is free)."""
    L = window_tokens
    tok = _tokenized(docs, text_col, id_col)
    t = F.col("t")
    n = F.size(t)
    idxs = F.when(n >= L, F.sequence(F.lit(0), n - L)).otherwise(
        F.array().cast("array<int>")
    )
    win = F.transform(
        idxs,
        lambda i: F.struct(
            i.alias("pos"),
            F.xxhash64(
                F.concat_ws(" ", F.slice(t, i + 1, F.lit(L)))
            ).alias("wkey"),
        ),
    )
    return tok.select("id", F.explode(win).alias("w")).select(
        "id", F.col("w.pos").alias("pos"), F.col("w.wkey").alias("wkey")
    )


def dup_window_marks(windows: DataFrame, keep_first: bool = False) -> DataFrame:
    """``(id, pos)`` of every window occurring >=2 times corpus-wide.
    Count-then-join: the groupBy collapses hot keys map-side; the join
    back is an equi-join AQE can skew-split."""
    dup = (
        windows.groupBy("wkey")
        .agg(
            F.count("*").alias("c"),
            F.min(F.struct("id", "pos")).alias("first_occ"),
        )
        .filter(F.col("c") >= 2)
        .select("wkey", "first_occ")
    )
    marks = windows.join(dup, "wkey")
    if keep_first:
        marks = marks.filter(
            ~(
                (F.col("id") == F.col("first_occ.id"))
                & (F.col("pos") == F.col("first_occ.pos"))
            )
        )
    return marks.select("id", "pos")


def dup_spans(marks: DataFrame, window_tokens: int) -> DataFrame:
    """``(id, s, e)`` — marked positions merged into maximal half-open
    token spans ``[s, e)`` via gaps-and-islands (a new island starts when
    a position clears every previous window's end)."""
    L = window_tokens
    w = Window.partitionBy("id").orderBy("pos")
    prev_end = F.max(F.col("pos") + L).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    newi = F.when(prev_end.isNull() | (F.col("pos") > prev_end), 1).otherwise(0)
    island = F.sum(newi).over(w.rowsBetween(Window.unboundedPreceding, 0))
    return (
        marks.select("id", "pos", island.alias("g"))
        .groupBy("id", "g")
        .agg(F.min("pos").alias("s"), (F.max("pos") + L).alias("e"))
        .select("id", "s", "e")
    )


def exactsubstr_clean(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window_tokens: int = 50,
    keep_first: bool = False,
) -> DataFrame:
    """``(id_col, n_spans, n_dup_tokens, clean_text)`` for EVERY doc:
    duplicated >=``window_tokens``-token spans removed, untouched docs
    carrying their normalized text with zero counts."""
    # the window explode (per-position hash over the token stream — by
    # far the heaviest expression here) is persisted so the dup-count
    # aggregation and the join back read ONE evaluation; the per-doc
    # span table is tiny (docs with duplicated spans only), so it is
    # materialized eagerly and the window cache released before return
    # (the _finish_pairs storage discipline)
    windows = token_windows(docs, text_col, id_col, window_tokens).persist()
    try:
        spans = dup_spans(dup_window_marks(windows, keep_first),
                          window_tokens)
        per_doc = spans.groupBy("id").agg(
            F.sort_array(F.collect_list(F.struct("s", "e"))).alias("spans"),
            F.count("*").alias("n_spans"),
            F.sum(F.col("e") - F.col("s")).alias("n_dup_tokens"),
        ).localCheckpoint(eager=True)
    finally:
        windows.unpersist(blocking=False)
    tok = _tokenized(docs, text_col, id_col)
    sp = F.coalesce(
        F.col("spans"), F.array().cast("array<struct<s:int,e:int>>")
    )
    kept = F.filter(
        F.col("t"),
        lambda _tok, i: ~F.exists(sp, lambda v: (i >= v.s) & (i < v.e)),
    )
    return tok.join(per_doc, "id", "left").select(
        F.col("id").alias(id_col),
        F.coalesce(F.col("n_spans"), F.lit(0)).cast("long").alias("n_spans"),
        F.coalesce(F.col("n_dup_tokens"), F.lit(0))
        .cast("long")
        .alias("n_dup_tokens"),
        F.concat_ws(" ", kept).alias("clean_text"),
    )
