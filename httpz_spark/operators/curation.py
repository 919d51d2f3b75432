"""Corpus-curation operators for LLM training-data pipelines: PII
scrubbing, per-domain quota sampling (domain mixing), sequence packing
(concat-and-chunk), and image+caption pair filtering (a LAION/DataComp
style gate battery).

The reference engine stops at capture (httpz_scanner/scanner.py builds
the result dict and stops); these operators extend the pipeline from
captured payloads to training shards — the training-data-pipeline
surface of SURVEY §2 Part C.

All pure native column expressions / window functions (whole-stage
codegen, zero Python UDFs); every formula is deliberately expressible in
ANSI SQL so the DuckDB oracle can replay it exactly.

Scale notes (100 TB):
- ``pii_scrub`` is a map-only stage — no shuffle, fully codegen'd
  regexp kernels.
- ``domain_quota_sample`` shuffles once on the domain key; because the
  rank filter is a row_number <= k, Catalyst plants a PARTIAL
  WindowGroupLimit before the exchange, so a hot host ships at most
  quota rows per map task — skew is bounded map-side, no salting needed.
- ``seq_pack`` avoids the classic global-cumsum trap: packing is done
  independently per hash shard, so the window sort is per-shard and the
  whole job is embarrassingly parallel across shards (this is how
  pretraining tokenizers shard packing in practice).
- ``image_pair_filter`` is map-only over the image-meta frame; in the
  crawl pipeline it composes directly on the decoded-payload frame from
  ``operators.multimodal.decode_stats`` joined with its caption column
  (same w / h / fmt contract).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from httpz_spark.operators.textstats import token_count

# (name, java+RE2-common regex, replacement token).  Order matters only
# if patterns can overlap; these are constructed disjoint (email needs
# '@', ipv4 is dotted-only, the dashed shapes have distinct group
# widths: phone 3-3-4, ssn 3-2-4, card 4-4-4-4 — no digit run matches
# two of them) so the sequential scrub is order-independent.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("cc", r"\b\d{4}-\d{4}-\d{4}-\d{4}\b", "<CC>"),
)


def pii_scrub(df: DataFrame, text_col: str = "text",
              patterns: tuple[tuple[str, str, str], ...] = PII_PATTERNS,
              out_col: str = "scrubbed") -> DataFrame:
    """Redact PII spans and count them per category.

    Adds ``n_<name>`` (match count against the ORIGINAL text) per
    pattern plus ``out_col`` with every pattern replaced by its token,
    applied in declaration order.  Map-only, all-native
    (regexp_count/regexp_replace are codegen'd JVM kernels).
    """
    scrubbed: Column = F.col(text_col)
    counts = []
    for name, pat, _ in patterns:
        counts.append(
            F.regexp_count(F.col(text_col), F.lit(pat)).alias(f"n_{name}"))
    for _, pat, tok in patterns:
        scrubbed = F.regexp_replace(scrubbed, pat, tok)
    return df.select("*", *counts, scrubbed.alias(out_col))


def domain_quota_sample(df: DataFrame, host_col: str = "host",
                        key_col: str = "doc_id", quota: int = 8,
                        rank_col: str = "samp_rank") -> DataFrame:
    """Cap each domain at ``quota`` docs, picked by deterministic md5
    rank (RefinedWeb-style domain balancing so over-crawled hosts don't
    dominate the training mix).

    One shuffle on ``host_col``; the within-host sort is the window
    sort.  Deterministic: rank orders by (md5(key), key), so reruns and
    resumes pick identical survivors.  Catalyst's WindowGroupLimit
    rewrite (visible in the executed plan) truncates each map task's
    output to quota rows per host BEFORE the exchange, so even a
    single mega-host never ships more than quota * n_tasks rows.
    """
    if quota < 1:
        raise ValueError(f"quota must be >= 1, got {quota}")
    rank_key = F.md5(F.col(key_col).cast("string"))
    w = Window.partitionBy(host_col).orderBy(rank_key, F.col(key_col))
    return (df.withColumn(rank_col, F.row_number().over(w))
              .filter(F.col(rank_col) <= quota))


def seq_pack(df: DataFrame, text_col: str = "text",
             key_col: str = "doc_id", ctx: int = 2048,
             n_shards: int = 16, tokens_col: str | None = None) -> DataFrame:
    """Concat-and-chunk sequence packing manifest: deterministic order
    within hash shards, cumulative token offsets, a doc lands in the
    context bin its first token falls into (bin = floor(start / ctx)).

    Returns one row per (shard, bin): n_docs, n_tokens, first/last doc.
    Packing has no global sequential dependency — each shard packs
    independently, so the window sort is per-shard (local[N] and a
    1000-executor cluster both scale linearly in shard count).

    ``tokens_col`` names a precomputed token-count column (skips the
    whitespace count over ``text_col`` — used when an upstream stage
    already scored the docs, e.g. the curated capstone).
    """
    if ctx < 1 or n_shards < 1:
        raise ValueError(f"ctx and n_shards must be >= 1: {ctx}, {n_shards}")
    tok = (F.col(tokens_col) if tokens_col
           else token_count(F.col(text_col)))
    toks = df.select(
        F.col(key_col),
        # pmod: negative keys still land in [0, n_shards)
        F.pmod(F.col(key_col), F.lit(n_shards)).alias("shard"),
        tok.alias("n_tok"),
    )
    w = Window.partitionBy("shard").orderBy(key_col)
    binned = toks.select(
        "shard", key_col, "n_tok",
        F.floor((F.sum("n_tok").over(w) - F.col("n_tok")) / ctx)
         .alias("bin_id"),
    )
    return (binned.groupBy("shard", "bin_id")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_tok").alias("n_tokens"),
                 F.min(key_col).alias("first_doc"),
                 F.max(key_col).alias("last_doc")))


def weighted_sample(df: DataFrame, k: int, weight_col: str,
                    id_col: str = "doc_id",
                    seed: str = "wsample") -> DataFrame:
    """Weighted sampling WITHOUT replacement, P ∝ weight — the corpus
    subsampler every mixture/curriculum recipe needs (take k docs
    favouring length/quality/importance).  Efraimidis & Spirakis (2006)
    via the Gumbel-top-k identity: top-k of ``ln(w) + Gumbel`` is an
    exact weighted sample, and the Gumbel noise is hash-derived
    (:func:`httpz_spark.operators.dsir.gumbel_key` — md5-seeded
    uniforms), so the selection is deterministic, partitioning-
    independent, exactly resumable, and SQL-replayable.

    Scale shape: adds one map-only scored column and plans as
    TakeOrderedAndProject — per-partition top-k then a k-row driver
    merge; no global sort shuffle, no RNG state.  Rows with
    weight <= 0 or NULL are never selected (P = 0).

    Returns the input columns plus ``sample_score`` (round-6 double),
    highest score first.
    """
    from httpz_spark.operators.dsir import gumbel_key

    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    w = F.col(weight_col).cast("double")
    score = gumbel_key(F.col(id_col), F.log(w), seed)
    return (
        df.filter(w.isNotNull() & (w > 0))
        .select("*", score.alias("sample_score"))
        .orderBy(F.col("sample_score").desc(), F.col(id_col))
        .limit(k)
    )


def corpus_report(df: DataFrame, text_col: str = "text",
                  keep_quality: float = 0.5) -> DataFrame:
    """One-pass corpus curation report: per predicted language, doc and
    token counts, summed quality, and the keep count at the quality
    gate — the observability summary a curation pipeline emits per
    shard.  One shuffle (groupBy on the language key), map-side
    combined.

    Quality is aggregated in integer micro-units
    (``round(quality * 1e6)`` per row) so the sum is order-independent
    — a float mean would drift with partition summation order and
    break bit-reproducibility across runs/engines.
    """
    from httpz_spark.operators.textstats import (
        lang_id,
        quality_score,
        token_count,
    )

    t = F.col(text_col)
    q = quality_score(t)
    scored = df.select(
        lang_id(t).alias("lang_pred"),
        token_count(t).alias("n_tok"),
        F.round(q * 1_000_000, 0).cast("long").alias("q_micro"),
        (q >= F.lit(float(keep_quality))).cast("int").alias("keep"),
    )
    return (scored.groupBy("lang_pred")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_tok").cast("long").alias("n_tokens"),
                 F.sum("q_micro").alias("sum_quality_micro"),
                 F.sum("keep").cast("long").alias("n_keep")))


def image_pair_filter(imgs: DataFrame, *, min_side: int = 200,
                      max_aspect: float = 3.0,
                      fmts: tuple[str, ...] = ("jpeg", "png", "webp"),
                      min_caption_tokens: int = 2,
                      max_caption_tokens: int = 77,
                      min_alpha_ratio: float = 0.5) -> DataFrame:
    """LAION/DataComp-style image+caption pair gate.

    Input contract: (w:int, h:int, fmt:string, caption:string) — the
    columns ``multimodal.decode_stats`` emits for fetched payloads
    joined with the pair table's caption, or any image-meta frame.
    Adds one boolean per signal plus the composite ``keep``:

    - size_ok:   min(w, h) >= min_side
    - aspect_ok: max(w, h) <= max_aspect * min(w, h)  (int-safe: no division)
    - fmt_ok:    fmt in fmts
    - cap_ok:    whitespace token count in [min_caption_tokens, max_caption_tokens]
    - alpha_ok:  [A-Za-z] char ratio of caption >= min_alpha_ratio

    Map-only; every signal is a codegen'd native expression.
    """
    w_, h_ = F.col("w"), F.col("h")
    cap = F.col("caption")
    cap_tokens = token_count(cap)
    alpha_ratio = (
        F.regexp_count(cap, F.lit(r"[A-Za-z]")).cast("double")
        / F.greatest(F.length(cap), F.lit(1)).cast("double"))
    size_ok = F.least(w_, h_) >= F.lit(min_side)
    aspect_ok = (F.greatest(w_, h_).cast("double")
                 <= F.lit(float(max_aspect)) * F.least(w_, h_).cast("double"))
    fmt_ok = F.col("fmt").isin(*fmts)
    cap_ok = ((cap_tokens >= F.lit(min_caption_tokens))
              & (cap_tokens <= F.lit(max_caption_tokens)))
    alpha_ok = alpha_ratio >= F.lit(float(min_alpha_ratio))
    return imgs.select(
        "*",
        size_ok.alias("size_ok"),
        aspect_ok.alias("aspect_ok"),
        fmt_ok.alias("fmt_ok"),
        cap_tokens.alias("cap_tokens"),
        cap_ok.alias("cap_ok"),
        alpha_ok.alias("alpha_ok"),
        (size_ok & aspect_ok & fmt_ok & cap_ok & alpha_ok).alias("keep"),
    )


# Placeholder soft-word list (RefinedWeb's production lists are a policy
# input — curated adult/fraud vocabularies — not code; deployments pass
# their own (word, weight) table).  Weights follow the paper's scheme:
# 1.0 = match alone blocks, fractional = needs co-occurrence.
URL_WORD_WEIGHTS: tuple[tuple[str, float], ...] = (
    ("casino", 1.0),
    ("clickbait", 1.0),
    ("tracker", 0.5),
    ("popup", 0.5),
)


def url_quality_signals(
    df: DataFrame,
    url_col: str = "url",
    *,
    blocked_hosts: DataFrame | None = None,
    word_weights: tuple[tuple[str, float], ...] = URL_WORD_WEIGHTS,
    max_len: int = 2048,
    max_digit_frac: float = 0.5,
    max_word_score: float = 0.99,
) -> DataFrame:
    """RefinedWeb-style URL filtering (Penedo et al. 2023 §3.1): score
    URLs BEFORE fetch/curation so a crawler never spends budget on
    documents a URL rule would drop.

    Adds one column per signal plus the composite ``url_keep``:

    - url_host:       lowercased authority (native regexp extract)
    - url_len:        character length; > max_len fails
    - url_digit_frac: digit fraction of the URL; > max_digit_frac fails
                      (session-id / tracking-sink URLs)
    - url_ip_host:    dotted-quad host literal fails (no domain signal)
    - url_word_score: sum of weights of soft-banned words appearing as
                      substrings of the lowercased URL; >= max_word_score
                      fails (weights per the paper: 1.0 blocks alone,
                      fractional needs co-occurrence)
    - url_blocked:    host present in the ``blocked_hosts`` frame
                      (column ``host``; broadcast left join — the
                      blocklist is a small dim table even at 10^6 rows)

    Map-only apart from the optional broadcast join; every signal is a
    codegen'd native expression in the Java-regex ∩ RE2 common subset,
    replayable in ANSI SQL (the contract-query oracle does).
    """
    url = F.col(url_col)
    lower = F.lower(url)
    host = F.lower(F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)", 1))
    ulen = F.length(url)
    digit_frac = (
        (ulen - F.length(F.regexp_replace(url, r"[0-9]", ""))).cast("double")
        / F.greatest(ulen, F.lit(1)).cast("double")
    )
    score: Column = F.lit(0.0)
    for word, weight in word_weights:
        score = score + F.when(
            F.instr(lower, word.lower()) > 0, F.lit(float(weight))
        ).otherwise(F.lit(0.0))
    ip_host = F.col("url_host").rlike(r"^\d{1,3}(\.\d{1,3}){3}$")

    out = df.select(
        "*",
        host.alias("url_host"),
        ulen.cast("long").alias("url_len"),
        F.round(digit_frac, 6).alias("url_digit_frac"),
        F.round(score, 6).alias("url_word_score"),
    ).withColumn("url_ip_host", ip_host)
    if blocked_hosts is not None:
        b = F.broadcast(
            blocked_hosts.select(F.lower(F.col("host")).alias("_bh")).distinct()
        )
        out = out.join(b, out["url_host"] == F.col("_bh"), "left").withColumn(
            "url_blocked", F.col("_bh").isNotNull()
        ).drop("_bh")
    else:
        out = out.withColumn("url_blocked", F.lit(False))
    keep = (
        ~F.col("url_blocked")
        & ~F.col("url_ip_host")
        & (F.col("url_len") <= F.lit(int(max_len)))
        & (F.col("url_digit_frac") <= F.lit(float(max_digit_frac)))
        & (F.col("url_word_score") < F.lit(float(max_word_score)))
    )
    return out.withColumn("url_keep", keep)


# default aspect buckets: the SD/LAION training ladder (w:h ratios)
ASPECT_BUCKETS = [
    (1, 1), (4, 3), (3, 4), (3, 2), (2, 3), (16, 9), (9, 16), (2, 1), (1, 2),
]


def aspect_bucket_batches(
    imgs: DataFrame,
    batch: int = 64,
    n_shards: int = 16,
    buckets: list[tuple[int, int]] | None = None,
    id_col: str = "image_id",
    w_col: str = "w",
    h_col: str = "h",
) -> DataFrame:
    """Aspect-ratio bucketing — the image-training analogue of
    :func:`seq_pack` (diffusion/LAION pipelines batch images of like
    aspect so a batch shares one resize target instead of square-crop
    mutilation): every image goes to the bucket whose ``bw:bh`` ratio
    is nearest ``w/h`` (absolute ratio difference, first-listed bucket
    wins ties), then batches of ``batch`` are cut per (bucket, shard).

    Returns ``(id_col, bucket_idx, bucket_w, bucket_h, shard,
    batch_id)``.  Scale shape mirrors seq_pack: the batch cut has NO
    global sequential dependency — shard = md5-prefix of the id mod
    ``n_shards`` (the cross-engine 52-bit contract, string-id-safe), so
    each (bucket, shard) packs independently and a window sorts only
    its own slice.  Bucket assignment itself is a map-only expression
    over a literal struct array (argmin via one array_sort — division
    only, no libm, so the oracle replays every comparison exactly).
    """
    bks = list(ASPECT_BUCKETS if buckets is None else buckets)
    if batch < 1 or n_shards < 1 or not bks:
        raise ValueError(
            f"batch/n_shards must be >= 1 and buckets non-empty: "
            f"{batch}, {n_shards}, {bks}"
        )
    r = F.col(w_col).cast("double") / F.col(h_col).cast("double")
    cands = F.array(
        *[
            F.struct(
                F.abs(r - F.lit(float(bw)) / F.lit(float(bh))).alias("d"),
                F.lit(i).alias("i"),
            )
            for i, (bw, bh) in enumerate(bks)
        ]
    )
    best = F.element_at(F.array_sort(cands), 1)["i"]
    from httpz_spark.operators.dsir import _md5_int52

    shard = F.pmod(_md5_int52(F.col(id_col).cast("string")), F.lit(n_shards))
    assigned = imgs.select(
        F.col(id_col),
        best.alias("bucket_idx"),
        shard.cast("int").alias("shard"),
    )
    w = Window.partitionBy("bucket_idx", "shard").orderBy(id_col)
    bw_arr = F.array(*[F.lit(bw) for bw, _ in bks])
    bh_arr = F.array(*[F.lit(bh) for _, bh in bks])
    return assigned.select(
        id_col,
        "bucket_idx",
        F.element_at(bw_arr, F.col("bucket_idx") + 1).alias("bucket_w"),
        F.element_at(bh_arr, F.col("bucket_idx") + 1).alias("bucket_h"),
        "shard",
        F.floor((F.row_number().over(w) - 1) / batch)
        .cast("long")
        .alias("batch_id"),
    )
