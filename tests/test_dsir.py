"""DSIR importance-resampling data selection (operators/dsir.py):
hashed n-gram features, LLR weights, deterministic Gumbel-top-k."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from httpz_spark.operators import dsir as DS


def _corpus(spark):
    # target style: "spark" query-engine prose; off-target: cooking
    rows = [
        (1, "spark shuffles partitions across the cluster for joins"),
        (2, "catalyst optimizes the logical plan into physical operators"),
        (3, "broadcast joins avoid shuffling the small dimension table"),
        (4, "simmer the onions in butter until golden and fragrant"),
        (5, "fold the flour into the batter and bake until set"),
        (6, "spark partitions and broadcast joins in the cluster plan"),
        (7, ""),  # empty: no features
        (8, "   "),  # whitespace-only
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    target = spark.createDataFrame(
        [
            (100, "spark partitions shuffles broadcast joins cluster plan"),
            (101, "catalyst logical plan physical operators optimizes joins"),
        ],
        "doc_id long, text string",
    )
    return docs, target


def test_features_buckets_and_counts(spark):
    docs, _ = _corpus(spark)
    B = 64
    f = DS.hashed_ngram_features(docs, buckets=B)
    rows = f.collect()
    assert all(0 <= r["bucket"] < B for r in rows)
    # doc 1: 8 tokens -> 8 unigrams + 7 bigrams = 15 grams total
    n1 = sum(r["cnt"] for r in rows if r["id"] == 1)
    assert n1 == 15
    # empty / whitespace docs contribute no feature rows
    assert not [r for r in rows if r["id"] in (7, 8)]


def test_bucket_hash_is_md5_prefix(spark):
    """The bucket of a known gram equals int(md5[:13], 16) % B — the
    cross-engine contract the DuckDB oracle relies on."""
    B = 10_000
    df = spark.createDataFrame([("spark",)], "g string")
    got = df.select(
        F.pmod(DS._md5_int52(F.col("g")), F.lit(B)).alias("b")
    ).collect()[0]["b"]
    want = int(hashlib.md5(b"spark").hexdigest()[:13], 16) % B
    assert got == want


def test_llr_table_complete_and_signed(spark):
    docs, target = _corpus(spark)
    B = 128
    tf = DS.hashed_ngram_features(target, buckets=B)
    rf = DS.hashed_ngram_features(docs, buckets=B)
    llr = DS.dsir_llr_table(spark, tf, rf, buckets=B).collect()
    assert len(llr) == B  # every slot present, even count-0 ones
    by_b = {r["bucket"]: float(r["llr"]) for r in llr}
    # a bucket hit by the target gets a higher ratio than an untouched one
    spark_b = int(hashlib.md5(b"spark").hexdigest()[:13], 16) % B
    empty = [b for b in range(B) if b != spark_b][0]
    assert by_b[spark_b] > min(by_b.values())
    # smoothing: no infinities anywhere
    assert all(math.isfinite(v) for v in by_b.values())


def test_logweights_rank_target_like_docs_higher(spark):
    docs, target = _corpus(spark)
    w = {
        r["doc_id"]: r
        for r in DS.dsir_logweights(docs, target, buckets=512).collect()
    }
    assert len(w) == 8
    # empty docs: n_feats 0, NULL weight
    assert w[7]["n_feats"] == 0 and w[7]["log_w"] is None
    assert w[8]["n_feats"] == 0 and w[8]["log_w"] is None
    # per-gram average weight: spark-ish docs beat cooking docs
    def avg(i):
        return w[i]["log_w"] / w[i]["n_feats"]

    assert min(avg(1), avg(2), avg(3), avg(6)) > max(avg(4), avg(5))


def test_resample_deterministic_topk(spark):
    docs, target = _corpus(spark)
    s1 = DS.dsir_resample(docs, target, k=3, buckets=512).collect()
    s2 = DS.dsir_resample(docs, target, k=3, buckets=512).collect()
    assert [tuple(r) for r in s1] == [tuple(r) for r in s2]
    assert len(s1) == 3
    # ordered by perturbed score desc; empty docs never selected
    scores = [r["score"] for r in s1]
    assert scores == sorted(scores, reverse=True)
    assert all(r["doc_id"] not in (7, 8) for r in s1)
    # a different seed may pick a different set but stays deterministic
    alt = DS.dsir_resample(docs, target, k=3, buckets=512, seed="other")
    assert len(alt.collect()) == 3


def test_resample_tracks_weights_without_noise_domination(spark):
    """With overwhelming weight separation the Gumbel noise cannot flip
    the choice: two EQUAL-LENGTH docs (log weights sum over grams, so
    length is held fixed), one made of target grams, one not."""
    docs = spark.createDataFrame(
        [
            (1, " ".join(["spark cluster join"] * 10)),
            (2, " ".join(["simmer onions butter"] * 10)),
        ],
        "doc_id long, text string",
    )
    target = spark.createDataFrame(
        [(9, "spark cluster join")], "doc_id long, text string"
    )
    top = DS.dsir_resample(docs, target, k=1, buckets=512).collect()
    assert [r["doc_id"] for r in top] == [1]


def test_plan_shapes(spark):
    """Scale contract: the LLR join broadcasts, scoring has no
    row-Python, selection plans as TakeOrderedAndProject."""
    docs, target = _corpus(spark)
    sel = DS.dsir_resample(docs, target, k=2, buckets=256)
    plan = sel._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan
    w = DS.dsir_logweights(docs, target, buckets=256)
    wplan = w._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in wplan
    assert "BatchEvalPython" not in wplan
