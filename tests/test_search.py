"""BM25 corpus search (operators/search.py)."""

import math

import pytest
from pyspark.sql import functions as F

from httpz_spark.operators.search import bm25_scores, bm25_topk


def _corpus(spark):
    return spark.createDataFrame(
        [
            (1, "spark spark spark engine"),            # high tf, short
            (2, "spark engine with a much longer body of words "
                "padding padding padding padding padding padding"),
            (3, "rare gem appears here once"),
            (4, "nothing relevant whatsoever in this document"),
            (5, "spark"),
        ],
        "doc_id long, text string",
    )


def _model(rows, terms, k1=1.2, b=0.75):
    """Independent float BM25 (no quantization) for approx parity."""
    toks = {i: t.lower().split() for i, t in rows}
    n = len(rows)
    avgdl = sum(len(v) for v in toks.values()) / n
    out = {}
    for t in terms:
        df = sum(1 for v in toks.values() if t in v)
        if not df:
            continue
        idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
        for i, v in toks.items():
            tf = v.count(t)
            if tf:
                dl = len(v)
                out[i] = out.get(i, 0.0) + idf * tf * (k1 + 1) / (
                    tf + k1 * (1 - b + b * dl / avgdl)
                )
    return out


def test_scores_match_independent_model(spark):
    rows = [(r["doc_id"], r["text"]) for r in _corpus(spark).collect()]
    terms = ["spark", "gem"]
    want = _model(rows, terms)
    got = {
        r["doc_id"]: r["score"]
        for r in bm25_scores(_corpus(spark), terms).collect()
    }
    assert set(got) == set(want)  # no-match docs absent
    for i in want:
        assert got[i] == pytest.approx(want[i], abs=1e-7)


def test_idf_and_length_normalization(spark):
    got = {
        r["doc_id"]: r
        for r in bm25_scores(_corpus(spark), ["spark", "gem"]).collect()
    }
    # rare term ("gem", df=1) outweighs common ("spark", df=3) at tf=1
    assert got[3]["score"] > got[5]["score"]
    # same term: high-tf short doc beats tf=1 long doc
    assert got[1]["score"] > got[2]["score"]
    assert got[1]["n_terms_hit"] == 1
    assert 4 not in got


def test_topk_order_and_plan(spark):
    top = bm25_topk(_corpus(spark), ["spark", "gem"], k=2)
    rows = top.collect()
    assert len(rows) == 2
    assert rows[0]["score"] >= rows[1]["score"]
    plan = top._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan
    wplan = bm25_scores(_corpus(spark), ["spark"])._jdf.queryExecution()
    assert "BroadcastHashJoin" in wplan.executedPlan().toString()


def test_empty_terms_rejected(spark):
    with pytest.raises(ValueError):
        bm25_scores(_corpus(spark), [])
