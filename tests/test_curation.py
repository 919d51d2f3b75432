"""Corpus-curation operators: PII scrub, domain quota sampling, sequence
packing, image+caption pair filtering (operators/curation.py).

The contract queries' DuckDB parity is the gate's job
(scripts/check_correctness.py); here we pin the operator semantics on
hand-built rows where the expected output is computable by eye.
"""

import pytest
from pyspark.sql import functions as F

from httpz_spark.operators.curation import (
    domain_quota_sample,
    image_pair_filter,
    pii_scrub,
    seq_pack,
)


# ---------------------------------------------------------------- pii_scrub

def test_pii_scrub_counts_and_redacts(spark):
    df = spark.createDataFrame(
        [
            (0, "mail me at bob.smith+x@corp.example.org today"),
            (1, "server 10.0.255.7 and 192.168.1.1 up"),
            (2, "call 555-123-4567 or 555-000-1111"),
            (3, "clean text with no pii at all"),
            (4, "a@b.io from 8.8.8.8 dial 111-222-3333"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in pii_scrub(df).collect()}
    assert (out[0]["n_email"], out[0]["n_ipv4"], out[0]["n_phone"]) == (1, 0, 0)
    assert out[0]["scrubbed"] == "mail me at <EMAIL> today"
    assert (out[1]["n_email"], out[1]["n_ipv4"]) == (0, 2)
    assert out[1]["scrubbed"] == "server <IP> and <IP> up"
    assert out[2]["n_phone"] == 2
    assert out[2]["scrubbed"] == "call <PHONE> or <PHONE>"
    assert out[3]["scrubbed"] == out[3]["text"]
    assert (out[4]["n_email"], out[4]["n_ipv4"], out[4]["n_phone"]) == (1, 1, 1)
    assert out[4]["scrubbed"] == "<EMAIL> from <IP> dial <PHONE>"


def test_pii_scrub_ssn_and_card(spark):
    df = spark.createDataFrame(
        [(0, "ssn 219-09-9999 card 4012-8888-8888-1881 tel 555-123-4567")],
        "doc_id long, text string",
    )
    r = pii_scrub(df).collect()[0]
    assert (r["n_ssn"], r["n_cc"], r["n_phone"]) == (1, 1, 1)
    assert r["scrubbed"] == "ssn <SSN> card <CC> tel <PHONE>"


def test_pii_scrub_phone_ip_disjoint(spark):
    # dashed phones never collide with dotted IPs and vice versa; a
    # version-ish dotted triple is not an IP (needs 4 octets)
    df = spark.createDataFrame(
        [(0, "v1.2.3 released; ip 1.2.3.4; serial 123-456-7890")],
        "doc_id long, text string",
    )
    r = pii_scrub(df).collect()[0]
    assert (r["n_email"], r["n_ipv4"], r["n_phone"]) == (0, 1, 1)
    assert r["scrubbed"] == "v1.2.3 released; ip <IP>; serial <PHONE>"


# ---------------------------------------------------- domain_quota_sample

def test_domain_quota_sample_caps_and_is_deterministic(spark):
    df = spark.createDataFrame(
        [(i, f"h{i % 3}") for i in range(100)], "doc_id long, host string"
    )
    out = domain_quota_sample(df, quota=5)
    per_host = {r["host"]: r["cnt"] for r in
                out.groupBy("host").agg(F.count("*").alias("cnt")).collect()}
    assert per_host == {"h0": 5, "h1": 5, "h2": 5}
    # ranks are 1..quota within each host
    ranks = sorted(r["samp_rank"] for r in out.filter(F.col("host") == "h0").collect())
    assert ranks == [1, 2, 3, 4, 5]
    # deterministic: identical survivor set on rerun
    ids1 = sorted(r["doc_id"] for r in out.collect())
    ids2 = sorted(r["doc_id"] for r in domain_quota_sample(df, quota=5).collect())
    assert ids1 == ids2


def test_domain_quota_sample_small_hosts_survive_whole(spark):
    df = spark.createDataFrame(
        [(1, "tiny"), (2, "tiny"), (3, "big"), (4, "big"), (5, "big"),
         (6, "big")],
        "doc_id long, host string",
    )
    out = domain_quota_sample(df, quota=3)
    kept = {r["host"]: 0 for r in out.collect()}
    for r in out.collect():
        kept[r["host"]] += 1
    assert kept == {"tiny": 2, "big": 3}


def test_domain_quota_sample_rejects_bad_quota(spark):
    df = spark.createDataFrame([(1, "h")], "doc_id long, host string")
    with pytest.raises(ValueError):
        domain_quota_sample(df, quota=0)


# -------------------------------------------------------------- seq_pack

def test_seq_pack_bins_by_start_offset(spark):
    # single shard (n_shards=1): docs of 4/4/4/9 tokens, ctx=10.
    # starts: 0,4,8,12 -> bins 0,0,0,1
    texts = [
        (0, "a b c d"),
        (1, "e f g h"),
        (2, "i j k l"),
        (3, "m n o p q r s t u"),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    out = {(r["shard"], r["bin_id"]): r
           for r in seq_pack(df, ctx=10, n_shards=1).collect()}
    assert set(out) == {(0, 0), (0, 1)}
    b0, b1 = out[(0, 0)], out[(0, 1)]
    assert (b0["n_docs"], b0["n_tokens"], b0["first_doc"], b0["last_doc"]) == (3, 12, 0, 2)
    assert (b1["n_docs"], b1["n_tokens"], b1["first_doc"], b1["last_doc"]) == (1, 9, 3, 3)


def test_seq_pack_shards_pack_independently(spark):
    # two shards by doc_id parity; each shard's offsets restart at 0
    df = spark.createDataFrame(
        [(i, "w " * 6) for i in range(8)], "doc_id long, text string"
    )  # 6 tokens each; per shard: starts 0,6,12,18 with ctx=12 -> bins 0,0,1,1
    rows = seq_pack(df, ctx=12, n_shards=2).collect()
    got = {(r["shard"], r["bin_id"]): (r["n_docs"], r["n_tokens"]) for r in rows}
    assert got == {(0, 0): (2, 12), (0, 1): (2, 12),
                   (1, 0): (2, 12), (1, 1): (2, 12)}


def test_seq_pack_empty_doc_counts_zero_tokens(spark):
    df = spark.createDataFrame(
        [(0, ""), (1, "  "), (2, "one two")], "doc_id long, text string"
    )
    rows = seq_pack(df, ctx=100, n_shards=1).collect()
    assert len(rows) == 1
    assert (rows[0]["n_docs"], rows[0]["n_tokens"]) == (3, 2)


def test_seq_pack_precomputed_tokens_col(spark):
    # tokens_col skips the text split; same bins as the text path when
    # the counts agree
    df = spark.createDataFrame(
        [(i, "w " * 6, 6) for i in range(4)],
        "doc_id long, text string, n_tokens long",
    )
    via_text = seq_pack(df, ctx=12, n_shards=1).collect()
    via_col = seq_pack(df, ctx=12, n_shards=1, tokens_col="n_tokens").collect()
    key = lambda r: (r["shard"], r["bin_id"], r["n_docs"], r["n_tokens"])
    assert sorted(map(key, via_text)) == sorted(map(key, via_col))


def test_seq_pack_negative_keys_shard_nonnegative(spark):
    df = spark.createDataFrame(
        [(-3, "a b"), (-2, "c d"), (5, "e f")], "doc_id long, text string"
    )
    rows = seq_pack(df, ctx=100, n_shards=4).collect()
    assert all(0 <= r["shard"] < 4 for r in rows)
    assert sum(r["n_docs"] for r in rows) == 3


def test_seq_pack_rejects_bad_args(spark):
    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        seq_pack(df, ctx=0)
    with pytest.raises(ValueError):
        seq_pack(df, n_shards=0)


# ---------------------------------------------------------- corpus_report

def test_corpus_report_aggregates(spark):
    from httpz_spark.operators.curation import corpus_report

    en = ("the cat and the dog went to the park and it is nice. " * 4).strip()
    df = spark.createDataFrame(
        [(0, en), (1, en), (2, "zzz qqq xxx")],
        "doc_id long, text string",
    )
    out = {r["lang_pred"]: r for r in corpus_report(df).collect()}
    assert out["en"]["n_docs"] == 2
    assert out["und"]["n_docs"] == 1
    # 13 whitespace tokens per repetition * 4 reps = 52 per en doc
    assert out["en"]["n_tokens"] == 104
    assert out["und"]["n_keep"] == 0          # short, no stopwords
    assert out["en"]["sum_quality_micro"] > 0


# ------------------------------------------------------ image_pair_filter

def _pairs(spark, rows):
    return spark.createDataFrame(
        rows, "image_id string, w int, h int, fmt string, caption string"
    )


def test_image_pair_filter_gates(spark):
    good_cap = "a clear photo of a dog on grass"
    df = _pairs(spark, [
        ("ok", 512, 512, "jpeg", good_cap),
        ("tiny", 100, 512, "jpeg", good_cap),          # size_ok fails
        ("banner", 900, 256, "png", good_cap),          # aspect 3.52 fails
        ("gif", 512, 512, "gif", good_cap),             # fmt fails
        ("shout", 512, 512, "webp", "dog"),             # 1 token < 2
        ("noise", 512, 512, "jpeg", "1234 5678 @@@@ 9"),  # alpha ratio 0
    ])
    out = {r["image_id"]: r for r in image_pair_filter(df).collect()}
    assert out["ok"]["keep"]
    assert not out["tiny"]["size_ok"] and not out["tiny"]["keep"]
    assert not out["banner"]["aspect_ok"]
    assert out["banner"]["size_ok"]
    assert not out["gif"]["fmt_ok"]
    assert not out["shout"]["cap_ok"]
    assert out["shout"]["cap_tokens"] == 1
    assert not out["noise"]["alpha_ok"]
    kept = [k for k, r in out.items() if r["keep"]]
    assert kept == ["ok"]


def test_image_pair_filter_aspect_boundary_is_inclusive(spark):
    df = _pairs(spark, [
        ("exact3", 768, 256, "jpeg", "a cat sitting on a mat"),
        ("over3", 769, 256, "jpeg", "a cat sitting on a mat"),
    ])
    out = {r["image_id"]: r for r in image_pair_filter(df).collect()}
    assert out["exact3"]["aspect_ok"]
    assert not out["over3"]["aspect_ok"]


def test_image_pair_filter_caption_token_cap(spark):
    long_cap = " ".join(f"w{i}" for i in range(78))
    df = _pairs(spark, [
        ("long", 512, 512, "jpeg", long_cap),
        ("cap77", 512, 512, "jpeg", " ".join(f"w{i}" for i in range(77))),
    ])
    out = {r["image_id"]: r for r in image_pair_filter(df).collect()}
    assert not out["long"]["cap_ok"]
    assert out["cap77"]["cap_ok"]


def test_image_pair_filter_composes_with_decode_frame(spark):
    # the decode stage's output columns (w/h/fmt from decoded pixels)
    # joined with captions satisfy the filter's input contract
    import numpy as np

    from httpz_spark.codecs.images import encode_png
    from httpz_spark.operators.multimodal import decode_stats

    def png(w, h, v):
        return bytearray(encode_png(np.full((h, w, 3), v, dtype=np.uint8)))

    imgs = spark.createDataFrame(
        [("i0", png(300, 250, 7), 300, 250, "png"),
         ("i1", png(16, 16, 9), 16, 16, "png")],
        "image_id string, bytes binary, w int, h int, fmt string",
    )
    caps = spark.createDataFrame(
        [("i0", "a red square on white"), ("i1", "a tiny icon")],
        "image_id string, caption string",
    )
    decoded = decode_stats(imgs).join(caps, "image_id")
    out = {r["image_id"]: r
           for r in image_pair_filter(decoded, fmts=("png",),
                                      min_side=200).collect()}
    assert out["i0"]["keep"] and out["i0"]["decode_ok"]
    assert not out["i1"]["size_ok"]


def test_url_quality_rules_each_fire(spark):
    from httpz_spark.operators.curation import url_quality_signals

    rows = [
        ("ok", "https://good.example/a/1?ref=page"),
        ("blocked", "https://BAD.example/a/1"),
        ("ip", "https://10.1.2.3/a/1"),
        ("long", "https://good.example/" + "z" * 300),
        ("digits", "https://good.example/?sid=" + "9" * 100),
        ("hardword", "https://good.example/?ref=casino"),
        ("softword", "https://good.example/?ref=tracker"),   # 0.5 < 0.99: keeps
        ("cooccur", "https://good.example/?ref=tracker&u=popup"),  # 1.0: drops
    ]
    df = spark.createDataFrame(rows, "tag string, url string")
    blocked = spark.createDataFrame([("bad.example",)], "host string")
    out = {r["tag"]: r for r in
           url_quality_signals(df, blocked_hosts=blocked, max_len=255).collect()}
    assert out["ok"]["url_keep"]
    assert out["blocked"]["url_blocked"] and not out["blocked"]["url_keep"]
    assert out["ip"]["url_ip_host"] and not out["ip"]["url_keep"]
    assert out["long"]["url_len"] > 255 and not out["long"]["url_keep"]
    assert out["digits"]["url_digit_frac"] > 0.5 and not out["digits"]["url_keep"]
    assert out["hardword"]["url_word_score"] == 1.0 and not out["hardword"]["url_keep"]
    assert out["softword"]["url_word_score"] == 0.5 and out["softword"]["url_keep"]
    assert out["cooccur"]["url_word_score"] == 1.0 and not out["cooccur"]["url_keep"]


def test_url_quality_map_only_plan(spark):
    # no blocklist -> pure map stage: no exchange, no python
    from httpz_spark.operators.curation import url_quality_signals

    df = spark.createDataFrame([("https://a.example/x",)], "url string")
    plan = url_quality_signals(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "BatchEvalPython" not in plan


def test_url_quality_composes_with_frontier(spark):
    # the crawl-pipeline placement: score seeds BEFORE they enter the
    # frontier so fetch budget is never spent on rule-dropped URLs
    from httpz_spark.operators.curation import url_quality_signals
    from httpz_spark.plans.frontier import urls_to_frontier

    seeds = spark.createDataFrame(
        [("https://ok.example/a",), ("https://bad.example/x",),
         ("https://10.0.0.1/y",), ("https://ok.example/?ref=casino",)],
        "raw string",
    )
    blocked = spark.createDataFrame([("bad.example",)], "host string")
    kept = (
        url_quality_signals(seeds, url_col="raw", blocked_hosts=blocked)
        .filter("url_keep").select("raw")
    )
    fr = urls_to_frontier(kept, "raw", depth=0, wave_id=0)
    assert [(r["host"], r["path"]) for r in fr.select("host", "path").collect()] \
        == [("ok.example", "/a")]


# -------------------------------------------------------- weighted_sample

def test_weighted_sample_exact_brute_force_match(spark):
    # the Gumbel noise is hash-derived, so the selected set and scores
    # must equal a driver-side brute-force replay of the same formula
    import hashlib
    import math

    from httpz_spark.operators.curation import weighted_sample

    rows = [(i, float(1 + (i * 7) % 50)) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, weight double")
    out = weighted_sample(df, k=10, weight_col="weight").collect()

    def score(i, w):
        u = (int(hashlib.md5(f"wsample:{i}".encode()).hexdigest()[:13], 16)
             + 0.5) / float(1 << 52)
        return round(math.log(w) + -math.log(-math.log(u)), 6)

    expect = sorted(((score(i, w), i, w) for i, w in rows),
                    key=lambda t: (-t[0], t[1]))[:10]
    assert [(r["sample_score"], r["doc_id"], r["weight"]) for r in out] \
        == expect


def test_weighted_sample_excludes_nonpositive_and_null_weights(spark):
    from httpz_spark.operators.curation import weighted_sample

    df = spark.createDataFrame(
        [(1, 5.0), (2, 0.0), (3, -3.0), (4, None), (5, 2.0)],
        "doc_id long, weight double",
    )
    out = weighted_sample(df, k=10, weight_col="weight")
    assert sorted(r["doc_id"] for r in out.collect()) == [1, 5]


def test_weighted_sample_partitioning_independent(spark):
    from httpz_spark.operators.curation import weighted_sample

    rows = [(i, float(i % 9 + 1)) for i in range(100)]
    df1 = spark.createDataFrame(rows, "doc_id long, weight double")
    df8 = df1.repartition(8)
    got1 = [r["doc_id"] for r in weighted_sample(df1, 7, "weight").collect()]
    got8 = [r["doc_id"] for r in weighted_sample(df8, 7, "weight").collect()]
    assert got1 == got8


def test_weighted_sample_plans_take_ordered(spark):
    from httpz_spark.operators.curation import weighted_sample

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 13 + 1.0).alias("weight"))
    plan = weighted_sample(df, 5, "weight")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan
    assert "Sort " not in plan.replace("TakeOrderedAndProject", "")


def test_weighted_sample_rejects_bad_k(spark):
    from httpz_spark.operators.curation import weighted_sample

    df = spark.createDataFrame([(1, 1.0)], "doc_id long, weight double")
    with pytest.raises(ValueError):
        weighted_sample(df, k=0, weight_col="weight")
