"""Model-based quality classification — the GPT-3 / LLaMA / RedPajama-2
"quality classifier" shape: train a linear text classifier on a labeled
reference set (GPT-3: WebText-positive vs Common-Crawl-negative; LLaMA: a
fastText classifier over Wikipedia-referenced pages), then score the whole
crawl and keep high-scoring documents.

The rebuild is multinomial Naive Bayes over a capped unigram vocabulary —
a linear model like fastText's (score = prior + Σ per-token weight) with
every number deliberately SQL-expressible so the DuckDB oracle replays the
train AND score passes exactly:

    w(tok)  = ln((cnt_pos + a)/(pos_tokens + a·Vc))
            - ln((cnt_neg + a)/(neg_tokens + a·Vc))
    prior   = ln((n_pos_docs + a)/(n_neg_docs + a))
    score(doc) = prior + Σ_{tok ∈ doc ∩ vocab} w(tok)

Out-of-vocabulary tokens contribute 0 (the fastText truncated-vocab rule);
``Vc`` is the KEPT vocabulary size, totals are over the kept vocabulary.

Scale shape (100 TB of crawl text, bounded labeled set):

* Training touches only the labeled reference set; the vocabulary cap is
  ``orderBy(total desc, tok).limit(vocab_size)`` — a TakeOrdered, never a
  global single-partition window.
* The weights table (≤ vocab_size rows) **broadcasts**: scoring is a
  map-only token explode + one broadcast hash join + ONE map-side-combined
  ``groupBy(doc)``.  The corpus is never shuffled on tokens.
* Per-doc weight sums are DECIMAL(20,9)-quantized (same discipline as
  :mod:`httpz_spark.operators.lmfilter`): exact, partition-order-
  independent, oracle-replayable.

Reference analogue: none — training-data-pipeline operator (SURVEY.md §2
training-data family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from httpz_spark.operators.lmfilter import _tokens


class NBModel:
    """Weights frame + driver scalars of a trained classifier."""

    def __init__(self, weights: DataFrame, prior: float, stats: dict):
        self.weights = weights          # (tok, w)
        self.prior = float(prior)
        self.stats = dict(stats)


def nb_train(
    labeled: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 4096,
    alpha: float = 0.5,
) -> NBModel:
    """Fit NB on ``labeled`` (``label_col``: 1 = quality/positive, 0 =
    negative).  Ties at the vocabulary-cap boundary break by token asc —
    fully deterministic."""
    toks = labeled.select(
        F.col(id_col).alias("id"),
        F.col(label_col).cast("int").alias("label"),
        F.explode(_tokens(F.col(text_col))).alias("tok"),
    )
    counts = toks.groupBy("tok").agg(
        F.sum(F.col("label")).alias("cnt_pos"),
        F.sum(1 - F.col("label")).alias("cnt_neg"),
    )
    vocab = (
        counts.orderBy(
            (F.col("cnt_pos") + F.col("cnt_neg")).desc(), F.col("tok")
        )
        .limit(int(vocab_size))
    )
    tot = vocab.agg(
        F.sum("cnt_pos").alias("pt"), F.sum("cnt_neg").alias("nt"),
        F.count("*").alias("vc"),
    ).collect()[0]
    docs = labeled.agg(
        F.sum((F.col(label_col) == 1).cast("int")).alias("np"),
        F.sum((F.col(label_col) == 0).cast("int")).alias("nn"),
    ).collect()[0]
    a = float(alpha)
    pt, nt, vc = float(tot["pt"]), float(tot["nt"]), int(tot["vc"])
    w = (
        F.log((F.col("cnt_pos").cast("double") + a) / F.lit(pt + a * vc))
        - F.log((F.col("cnt_neg").cast("double") + a) / F.lit(nt + a * vc))
    )
    weights = vocab.select("tok", w.alias("w"))
    import math

    prior = math.log((int(docs["np"]) + a) / (int(docs["nn"]) + a))
    return NBModel(weights, prior, {
        "pos_tokens": pt, "neg_tokens": nt, "vocab_kept": vc,
        "n_pos_docs": int(docs["np"]), "n_neg_docs": int(docs["nn"]),
        "alpha": a,
    })


def nb_score(
    docs: DataFrame,
    model: NBModel,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_weights: bool = True,
) -> DataFrame:
    """``(doc_id, n_matched, score, quality_pred)`` — ``n_matched`` is the
    count of in-vocabulary token occurrences, ``score`` the NB log-odds,
    ``quality_pred`` the score>0 decision.  A doc with zero in-vocabulary
    tokens scores exactly the prior.

    One-pass shape: every doc LEFT-joins the per-doc weight sums (a miss
    degrades to ``prior + 0.0 = prior`` exactly).  A union-plus-anti-join
    would re-evaluate the whole explode+join+agg subtree inside the anti
    branch — AQE does not install a ReusedExchange across union branches."""
    wts = model.weights.select(
        "tok", F.round("w", 9).cast("decimal(20,9)").alias("wq")
    )
    if broadcast_weights:
        wts = F.broadcast(wts)
    toks = docs.select(
        F.col(id_col).alias("id"), F.explode(_tokens(F.col(text_col))).alias("tok")
    )
    agg = (
        toks.join(wts, "tok")  # inner: OOV tokens contribute 0
        .groupBy("id")
        .agg(F.count("*").alias("n"), F.sum("wq").alias("sw"))
    )
    score = F.lit(model.prior) + F.coalesce(
        F.col("sw").cast("double"), F.lit(0.0)
    )
    return (
        docs.select(F.col(id_col).alias("id"))
        .join(agg, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_matched"),
            score.alias("score"),
            (score > 0).cast("boolean").alias("quality_pred"),
        )
    )
