"""Eval-set decontamination (operators/decontam.py): the GPT-3
appendix-C n-gram overlap rule over the shared shingle substrate."""

import io
import contextlib

import pytest
from pyspark.sql import functions as F

from httpz_spark.operators import decontam as DC


PASSAGE = "the quick brown fox jumps over the lazy dog near the old mill"


def _corpus(spark):
    train = spark.createDataFrame(
        [
            # shares a >=5-word passage with the eval doc, otherwise unique
            (1, "intro words here " + PASSAGE + " and some trailing text"),
            # unrelated
            (2, "completely different content about distributed query engines"),
            # near-dups of each other, NOT of any eval doc
            (3, "spark catalyst optimizes logical plans into physical plans fast"),
            (4, "spark catalyst optimizes logical plans into physical plans quickly"),
            # short doc (< ngram words): whole-text fallback, no eval match
            (5, "tiny doc"),
        ],
        "doc_id long, text string",
    )
    evald = spark.createDataFrame(
        [(100, "benchmark question: " + PASSAGE + " what happens next")],
        "doc_id long, text string",
    )
    return train, evald


def test_contaminated_only_via_eval_overlap(spark):
    """Differentiator: doc 1 is dropped ONLY because of eval overlap —
    it is not a near-dup of anything in train; the near-dup pair (3,4)
    survives decontamination untouched (dedup is a separate stage)."""
    train, evald = _corpus(spark)
    kept = DC.decontaminate(train, evald, ngram=5)
    assert sorted(r["doc_id"] for r in kept.select("doc_id").collect()) == [2, 3, 4, 5]
    assert kept.columns == train.columns  # all original columns preserved


def test_report_counts_match_python_model(spark):
    """n_overlap_grams / n_eval_docs equal a brute-force python recompute
    of distinct shared 5-gram shingles."""
    train, evald = _corpus(spark)

    def shingles(text, k=5):
        ws = " ".join(text.lower().split()).split(" ")
        if len(ws) < k:
            return {" ".join(ws)}
        return {" ".join(ws[i:i + k]) for i in range(len(ws) - k + 1)}

    trows = {r["doc_id"]: r["text"] for r in train.collect()}
    erows = {r["doc_id"]: r["text"] for r in evald.collect()}
    want = {}
    for tid, ttxt in trows.items():
        ts = shingles(ttxt)
        hit_grams, hit_evals = set(), set()
        for eid, etxt in erows.items():
            common = ts & shingles(etxt)
            if common:
                hit_grams |= common
                hit_evals.add(eid)
        if hit_grams:
            want[tid] = (len(hit_grams), len(hit_evals))
    got = {r["doc_id"]: (r["n_overlap_grams"], r["n_eval_docs"])
           for r in DC.contamination_report(train, evald, ngram=5).collect()}
    assert got == want and 1 in got, (got, want)


def test_min_overlap_threshold(spark):
    """min_overlap > 1 keeps docs with fewer shared grams than the bar."""
    train, evald = _corpus(spark)
    n1 = DC.contamination_report(train, evald, ngram=5).collect()[0]["n_overlap_grams"]
    assert n1 > 1
    # bar just above the observed overlap: nothing dropped
    kept = DC.decontaminate(train, evald, ngram=5, min_overlap=n1 + 1)
    assert kept.count() == train.count()
    # bar at the observed overlap: doc 1 dropped
    kept = DC.decontaminate(train, evald, ngram=5, min_overlap=n1)
    assert sorted(r["doc_id"] for r in kept.collect()) == [2, 3, 4, 5]


def test_whole_text_fallback_for_short_docs(spark):
    """A short training doc is contaminated only by an exact whole-text
    match with a short eval doc (word_shingles' documented fallback)."""
    train = spark.createDataFrame(
        [(1, "tiny doc"), (2, "other tiny")], "doc_id long, text string")
    evald = spark.createDataFrame(
        [(100, "Tiny  DOC")], "doc_id long, text string")  # normalizes equal
    kept = DC.decontaminate(train, evald, ngram=13)
    assert [r["doc_id"] for r in kept.collect()] == [2]


def test_drop_only_path_plans_broadcast_semi_join(spark):
    """Scale shape: with min_overlap=1 the contamination check must plan
    as a broadcast LEFT SEMI hash join (eval grams broadcast, train gram
    stream never shuffled for the join) and zero Python stages."""
    train, evald = _corpus(spark)
    drop = DC.contaminated_ids(train, evald, ngram=5)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        drop.explain("formatted")
    p = buf.getvalue()
    assert "BroadcastHashJoin" in p and "LeftSemi" in p, p
    assert "SortMergeJoin" not in p, p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p
    # non-broadcast fallback still correct
    ids = {r["doc_id"] for r in
           DC.contaminated_ids(train, evald, ngram=5,
                               broadcast_evals=False).collect()}
    assert ids == {1}
