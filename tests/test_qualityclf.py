"""Model-based quality classifier (GPT-3/fastText shape) — operator tests."""

import math
import os

import pytest
from pyspark.sql import functions as F

from httpz_spark.operators.qualityclf import nb_score, nb_train

SF_DIR = os.environ.get("HTTPZ_TEST_SF_DIR", "/root/testdata/sf0.001")

POS = [
    "the encyclopedia article cites peer reviewed sources and explains the method",
    "a careful study with clear references and a reproducible experiment design",
    "the documentation explains the algorithm with examples and cited papers",
    "this well written essay presents evidence and a balanced clear argument",
]
NEG = [
    "click here buy cheap pills win big casino jackpot now free free free",
    "hot singles click now free prize winner claim your cash bonus today",
    "buy now limited offer cheap deals click click subscribe win prize",
    "free bonus cash win now claim jackpot casino spins click here today",
]


@pytest.fixture(scope="module")
def labeled(spark):
    rows = [(i, 1, t) for i, t in enumerate(POS)] + [
        (100 + i, 0, t) for i, t in enumerate(NEG)
    ]
    return spark.createDataFrame(rows, ["doc_id", "label", "text"])


@pytest.fixture(scope="module")
def model(labeled):
    m = nb_train(labeled, vocab_size=4096)
    m.weights = m.weights.localCheckpoint()
    return m


def test_separates_heldout_docs(spark, model):
    """The operator's whole point: unseen quality-like text scores above 0,
    unseen spam-like text below."""
    held = spark.createDataFrame(
        [
            (1, "the article explains the experiment with clear cited sources"),
            (2, "win free casino cash click now claim your bonus prize"),
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in nb_score(held, model).collect()}
    assert rows[1]["quality_pred"] is True
    assert rows[2]["quality_pred"] is False
    assert rows[1]["score"] > rows[2]["score"]


def test_weight_formula_hand_check(spark):
    """Tiny corpus where every number is computable by hand:
    pos doc 'good good fine', neg doc 'bad bad fine' ->
    w(good) = ln(2.5/4.5) - ln(0.5/4.5) = ln 5, prior = ln(1.5/1.5) = 0."""
    lab = spark.createDataFrame(
        [(1, 1, "good good fine"), (2, 0, "bad bad fine")],
        ["doc_id", "label", "text"],
    )
    m = nb_train(lab)
    assert m.prior == pytest.approx(0.0)
    w = {r["tok"]: r["w"] for r in m.weights.collect()}
    assert w["good"] == pytest.approx(math.log(5.0))
    assert w["bad"] == pytest.approx(-math.log(5.0))
    assert w["fine"] == pytest.approx(0.0)
    doc = spark.createDataFrame([(9, "good fine")], ["doc_id", "text"])
    row = nb_score(doc, m).collect()[0]
    assert row["n_matched"] == 2
    # weights are quantized to 9 decimals before the sum
    assert row["score"] == pytest.approx(round(math.log(5.0), 9), abs=1e-8)


def test_oov_and_empty_docs_score_prior(spark, model):
    """Zero in-vocabulary tokens (all-OOV or empty text) -> the doc still
    surfaces, n_matched = 0, score = exactly the class prior."""
    docs = spark.createDataFrame(
        [(1, "zzqx1 zzqx2 zzqx3"), (2, ""), (3, "   ")], ["doc_id", "text"]
    )
    rows = {r["doc_id"]: r for r in nb_score(docs, model).collect()}
    for i in (1, 2, 3):
        assert rows[i]["n_matched"] == 0
        assert rows[i]["score"] == pytest.approx(model.prior)


def test_vocab_cap_keeps_top_total_tie_by_token(spark):
    """vocab_size cap orders by total count desc then token asc — 'apple'
    and 'zebra' tie on total, the cap keeps the lexicographically first."""
    lab = spark.createDataFrame(
        [(1, 1, "common common apple"), (2, 0, "common common zebra")],
        ["doc_id", "label", "text"],
    )
    m = nb_train(lab, vocab_size=2)
    kept = sorted(r["tok"] for r in m.weights.collect())
    assert kept == ["apple", "common"]
    assert m.stats["vocab_kept"] == 2
    # totals are over the KEPT vocabulary only
    assert m.stats["pos_tokens"] == 3.0  # common x2 (pos) + apple
    assert m.stats["neg_tokens"] == 2.0  # common x2 (neg); zebra dropped


def test_oov_tokens_contribute_zero(spark, model):
    """A doc padded with OOV junk scores identically to the clean doc."""
    docs = spark.createDataFrame(
        [
            (1, "clear cited sources"),
            (2, "clear zzqx9 cited zzqx8 sources zzqx7"),
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in nb_score(docs, model).collect()}
    assert rows[1]["score"] == pytest.approx(rows[2]["score"])
    assert rows[1]["n_matched"] == rows[2]["n_matched"] == 3


def test_scoring_plan_broadcasts_and_stays_native(spark, model):
    """Scale shape: the weights join is a broadcast hash join and the whole
    scoring plan contains no per-row Python."""
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    plan = nb_score(docs, model)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan


def test_score_on_corpus_matches_manual_recompute(spark, model):
    """End-to-end on real parquet docs: recompute one doc's score from the
    collected weights table."""
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).limit(5)
    w = {r["tok"]: round(float(r["w"]), 9) for r in model.weights.collect()}
    out = {r["doc_id"]: r for r in nb_score(docs, model).collect()}
    for r in docs.collect():
        toks = r["text"].lower().split()
        hit = [t for t in toks if t in w]
        expect = model.prior + sum(w[t] for t in hit)
        assert out[r["doc_id"]]["n_matched"] == len(hit)
        assert out[r["doc_id"]]["score"] == pytest.approx(expect, abs=1e-6)
