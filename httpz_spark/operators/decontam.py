"""Eval-set decontamination: drop (or flag) training documents that
share word-n-grams with a benchmark/eval corpus.

This is the GPT-3 appendix-C / Lee et al. (ACL'22) eval-overlap rule the
big LLM pipelines run before training: a training document is
*contaminated* when it shares at least ``min_overlap`` distinct
``ngram``-word shingles with ANY eval document (GPT-3 used 13-grams with
``min_overlap=1``).  The reference scanner has no analogue — this is a
training-data-pipeline operator grafted onto the same shingle substrate
as minhash/jaccard dedup (:func:`httpz_spark.operators.dedup.word_shingles`).

Scale shape (the part that matters at 100 TB of training text):

* The EVAL side is tiny compared to the training corpus (benchmarks are
  thousands of docs, the corpus is billions), so the eval gram table is
  **broadcast** — the contamination check is a map-side hash join against
  the streaming train-shingle explode, with NO shuffle of the training
  gram stream.  The only shuffle is the final ``groupBy(train id)`` for
  the overlap counts (map-side combined), and none at all on the
  drop-only path's semi join.
* Train-side shingles are already per-doc-distinct (``word_shingles``
  applies ``array_distinct`` before the explode), so a hot gram repeated
  inside one doc costs one row, and the df-cap problem of pair-dedup does
  not arise: the join is train-grams x eval-grams, never train x train.
* ``broadcast_evals=False`` falls back to a plain shuffle equi-join for
  the rare eval-corpus-is-huge case; the plan is otherwise identical.

Docs shorter than ``ngram`` words degrade to a single whole-text shingle
(word_shingles' documented fallback), i.e. short training docs are dropped
only on a whole-text match with a short eval doc — the conservative
reading of the rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from httpz_spark.operators.dedup import word_shingles


def eval_grams(eval_docs: DataFrame, text_col: str = "text",
               id_col: str = "doc_id", ngram: int = 13) -> DataFrame:
    """``(eval_id, shingle)`` distinct word-``ngram`` shingles of the eval
    corpus — the broadcast side of the contamination join.  Kept per-doc
    (not globally distinct) so reports can attribute hits to eval docs."""
    return (
        word_shingles(eval_docs, text_col, id_col, k=ngram)
        .withColumnRenamed("id", "eval_id")
        .distinct()
    )


def contamination_report(
    train: DataFrame, eval_docs: DataFrame,
    text_col: str = "text", id_col: str = "doc_id",
    ngram: int = 13, broadcast_evals: bool = True,
) -> DataFrame:
    """Per-contaminated-training-doc report: ``(doc_id, n_overlap_grams,
    n_eval_docs)`` — the number of distinct shared ``ngram``-word grams
    and the number of distinct eval docs sharing any.  Docs with zero
    overlap are absent (the common case at scale; callers wanting the
    full corpus annotated can left-join this back)."""
    ev = eval_grams(eval_docs, text_col, id_col, ngram)
    if broadcast_evals:
        ev = F.broadcast(ev)
    tr = word_shingles(train, text_col, id_col, k=ngram)
    return (
        tr.join(ev, "shingle")
        .groupBy(F.col("id").alias(id_col))
        .agg(
            F.count_distinct("shingle").alias("n_overlap_grams"),
            F.count_distinct("eval_id").alias("n_eval_docs"),
        )
    )


def contaminated_ids(
    train: DataFrame, eval_docs: DataFrame,
    text_col: str = "text", id_col: str = "doc_id",
    ngram: int = 13, min_overlap: int = 1, broadcast_evals: bool = True,
) -> DataFrame:
    """The drop-list: one ``id_col`` row per training doc sharing >=
    ``min_overlap`` distinct grams with the eval corpus.  With the
    default ``min_overlap=1`` this plans as a broadcast SEMI join +
    distinct — no gram-level aggregation at all."""
    if min_overlap <= 1:
        ev = eval_grams(eval_docs, text_col, id_col, ngram).select("shingle")
        if broadcast_evals:
            ev = F.broadcast(ev)
        tr = word_shingles(train, text_col, id_col, k=ngram)
        return (
            tr.join(ev, "shingle", "left_semi")
            .select(F.col("id").alias(id_col))
            .distinct()
        )
    return (
        contamination_report(train, eval_docs, text_col, id_col, ngram,
                             broadcast_evals)
        .filter(F.col("n_overlap_grams") >= min_overlap)
        .select(id_col)
    )


def decontaminate(
    train: DataFrame, eval_docs: DataFrame,
    text_col: str = "text", id_col: str = "doc_id",
    ngram: int = 13, min_overlap: int = 1, broadcast_evals: bool = True,
) -> DataFrame:
    """The training corpus with contaminated docs removed (all original
    columns preserved): an anti-join against :func:`contaminated_ids`."""
    drop = contaminated_ids(train, eval_docs, text_col, id_col, ngram,
                            min_overlap, broadcast_evals)
    return train.join(drop, id_col, "left_anti")
