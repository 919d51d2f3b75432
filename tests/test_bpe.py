"""BPE tokenizer (operators/bpe.py): Sennrich merges learned on the
word-frequency dict, distinct-word Arrow segmentation."""

import pytest
from pyspark.sql import functions as F

from httpz_spark.operators.bpe import (
    EOW,
    bpe_segment,
    bpe_token_counts,
    bpe_train,
)


def _corpus(spark):
    # the classic BPE teaching corpus: low/lower/newest/widest
    text = " ".join(
        ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    )
    return spark.createDataFrame([(1, text)], "doc_id long, text string")


def test_train_learns_expected_first_merges(spark):
    merges = bpe_train(_corpus(spark), num_merges=4)
    # 'es' appears 9x (newest+widest) — the classic first merge; then
    # 'es'+'t' (9), then 'est</w>' (9), then 'l'+'o' (7)
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert merges[2] == ("est", EOW)
    assert merges[3] == ("l", "o")


def test_segment_applies_rank_order():
    merges = [("e", "s"), ("es", "t"), ("est", EOW), ("l", "o"), ("lo", "w")]
    ranks = {p: i for i, p in enumerate(merges)}
    assert bpe_segment("newest", ranks) == ["n", "e", "w", "est" + EOW]
    assert bpe_segment("low", ranks) == ["low", EOW]
    assert bpe_segment("xyz", ranks) == ["x", "y", "z", EOW]


def test_token_counts(spark):
    docs = spark.createDataFrame(
        [
            (1, "low low newest"),
            (2, "widest low"),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    merges = bpe_train(docs, num_merges=50)
    out = {r["doc_id"]: r for r in bpe_token_counts(docs, merges).collect()}
    assert len(out) == 3
    assert out[3]["n_words"] == 0 and out[3]["n_bpe_tokens"] == 0
    assert out[1]["n_words"] == 3
    # fully-merged frequent words compress to few tokens; counts are
    # exactly the python segmenter's, summed per occurrence
    ranks = {p: i for i, p in enumerate(merges)}
    for i, text in ((1, "low low newest"), (2, "widest low")):
        want = sum(len(bpe_segment(w, ranks)) for w in text.split())
        assert out[i]["n_bpe_tokens"] == want


def test_deterministic_across_partitionings(spark):
    d = _corpus(spark)
    m1 = bpe_train(d, num_merges=10)
    m2 = bpe_train(d.repartition(8), num_merges=10)
    assert m1 == m2


def test_plan_uses_arrow_not_row_python(spark):
    docs = _corpus(spark)
    merges = bpe_train(docs, num_merges=5)
    out = bpe_token_counts(docs, merges)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan
