"""BM25 corpus search — Robertson/Spärck Jones Okapi BM25 with the
Lucene idf variant, the standard keyword-relevance score a crawl corpus
gets queried with (and the retrieval half of quality-by-query pipelines
like WebText's "pages Reddit users linked" seed expansion).

    score(D, Q) = sum_{t in Q} idf(t) * tf * (k1 + 1)
                    / (tf + k1 * (1 - b + b * |D| / avgdl))
    idf(t)      = ln(1 + (N - df + 0.5) / (df + 0.5))

Scale shape:

* Query terms are a LITERAL ``isin`` filter applied directly to the
  token explode — no join at all on the corpus stream, and the filter
  reaches the scan side of the explode.  Only matching (doc, term)
  rows survive into the single map-side-combined ``groupBy``.
* ``df`` / ``idf`` live in a |Q|-row frame (computed JVM-side so the
  ln matches the scoring engine bit-for-bit) that **broadcasts**.
* ``N`` and ``avgdl`` are two scalars pulled to the driver (one count
  + one sum over a map-only length projection — the same bounded
  driver hop as ``lm_train``'s vocab size).
* Per-(doc, term) score summands are rounded to 9 decimals and summed
  as DECIMAL — exact, order-independent, replayable by the oracle.
* Top-k plans as TakeOrderedAndProject (per-partition top-k, k-row
  driver merge, no global sort).

Reference analogue: none (the httpz scanner stores, never ranks);
training-data / corpus-analytics operator (SURVEY.md §2 family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from httpz_spark.functions.text import tokens_of as _tokens


def bm25_scores(
    docs: DataFrame,
    terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """``(id_col, n_terms_hit, score)`` for every document matching at
    least one query term."""
    if not terms:
        raise ValueError("terms must be a non-empty list of query words")
    tok = docs.select(
        F.col(id_col).alias("id"), _tokens(F.col(text_col)).alias("t")
    ).select("id", F.size("t").alias("dl"), "t")
    # one action for both corpus scalars (every tok row is one doc)
    stats = tok.agg(
        F.count("*").alias("n"), F.sum("dl").alias("tdl")
    ).collect()[0]
    n_docs = stats["n"]
    avgdl = float(stats["tdl"] or 0) / n_docs if n_docs else 0.0

    hits = (
        tok.select("id", "dl", F.explode("t").alias("tok"))
        .filter(F.col("tok").isin(list(terms)))
        .groupBy("id", "tok")
        .agg(F.count("*").alias("tf"), F.max("dl").alias("dl"))
    )
    # hits is already unique per (id, tok): plain count IS the doc freq
    dfreq = hits.groupBy("tok").agg(F.count("*").alias("df"))
    idf = F.broadcast(
        dfreq.select(
            "tok",
            F.log(
                F.lit(1.0)
                + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            ).alias("idf"),
        )
    )
    frac = (F.col("tf") * F.lit(k1 + 1.0)) / (
        F.col("tf")
        + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.lit(avgdl))
    )
    return (
        hits.join(idf, "tok")
        .select(
            "id",
            F.round(F.col("idf") * frac, 9).cast("decimal(20,9)").alias("sc"),
        )
        .groupBy("id")
        .agg(F.count("*").alias("n_terms_hit"), F.sum("sc").alias("score"))
        .select(
            F.col("id").alias(id_col),
            F.col("n_terms_hit").cast("long").alias("n_terms_hit"),
            F.col("score").cast("double").alias("score"),
        )
    )


def bm25_topk(
    docs: DataFrame,
    terms: list[str],
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` documents by BM25, highest first; ties broken by id.
    TakeOrderedAndProject — never a global sort."""
    scored = bm25_scores(docs, terms, text_col, id_col, k1, b)
    return scored.orderBy(
        F.round("score", 6).desc(), F.col(id_col)
    ).limit(k)
