"""Training-data mixture planning — the LLaMA / The-Pile source table:
each corpus source gets a sampling weight, and the epoch manifest
upsamples (or downsamples) every source to its target token share by
per-document repetition factors (LLaMA trains Wikipedia ~2.45 epochs,
CommonCrawl 0.64; The Pile publishes the same "epochs" column).

For source ``s`` with available tokens ``A_s``, weight ``w_s`` and a
total token budget ``B``:

    target_s = B * w_s / sum(w)          (the mixture share)
    r_s      = target_s / A_s            (the epoch/repetition factor)

Every doc of ``s`` appears ``floor(r_s)`` times, plus one more with
probability ``frac(r_s)`` — decided by the deterministic md5-derived
uniform of its id (the same 52-bit contract as DSIR), so the expected
token count of the manifest is exactly ``target_s`` per source and the
manifest is partitioning-independent, resumable, and SQL-replayable.

Scale shape: ONE aggregation pass over the corpus for the per-source
token totals (a |sources|-row collect — the bounded-model driver hop),
then the manifest is a PURE MAP with the per-source factor table
broadcast: no window, no per-source global cumsum, no shuffle at all
beyond the totals.  This is deliberately the per-doc-Bernoulli
fractional rule (what production samplers do) rather than an exact
rank-prefix cut, which would need a per-source global sort —
one hot source = one reducer at 100 TB.

Reference analogue: none; training-data-pipeline operator
(SURVEY.md §2 training-data family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from httpz_spark.operators.dsir import _MD5_SPAN, _md5_int52
from httpz_spark.operators.textstats import token_count


def mixture_plan(
    docs: DataFrame,
    weights: dict[str, float],
    token_budget: int,
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: str | None = None,
) -> list[dict]:
    """The per-source plan (driver-side, |sources| rows):
    ``[{source, available_tokens, weight, target_tokens, repeats,
    base_copies, frac}]``.  Sources absent from ``weights`` get weight
    0 (dropped); weighted sources absent from the corpus are ignored."""
    if token_budget < 0 or not weights:
        raise ValueError("token_budget must be >= 0 and weights non-empty")
    if any(w < 0 for w in weights.values()):
        raise ValueError(f"negative weight in {weights}")
    tok = F.col(tokens_col) if tokens_col else token_count(F.col(text_col))
    totals = {
        r["s"]: r["a"]
        for r in docs.select(F.col(source_col).alias("s"), tok.alias("a"))
        .groupBy("s")
        .agg(F.sum("a").alias("a"))
        .collect()
    }
    wsum = float(sum(weights.values()))
    if wsum <= 0:
        raise ValueError("weights sum to zero")
    plan = []
    for s, a in sorted(totals.items()):
        w = float(weights.get(s, 0.0))
        target = token_budget * w / wsum
        r = target / a if a else 0.0
        plan.append(
            {
                "source": s,
                "available_tokens": int(a),
                "weight": w,
                "target_tokens": target,
                "repeats": r,
                "base_copies": int(r),
                "frac": r - int(r),
            }
        )
    return plan


def mixture_manifest(
    docs: DataFrame,
    weights: dict[str, float],
    token_budget: int,
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: str | None = None,
    seed: str = "mix",
) -> DataFrame:
    """``(id_col, source, n_tokens, n_copies)`` for every doc with
    ``n_copies >= 1`` — the epoch manifest.  ``n_copies = base_copies +
    (u < frac)`` with ``u = (md5_52(seed:id) + 0.5) / 2^52``; expected
    manifest tokens per source == its target share.  Pure map over a
    broadcast |sources|-row factor table."""
    plan = mixture_plan(
        docs, weights, token_budget, source_col, id_col, text_col, tokens_col
    )
    spark = docs.sparkSession
    factors = F.broadcast(
        spark.createDataFrame(
            [(p["source"], p["base_copies"], p["frac"]) for p in plan],
            "source string, base_copies int, frac double",
        )
    )
    tok = F.col(tokens_col) if tokens_col else token_count(F.col(text_col))
    u = (
        _md5_int52(
            F.concat(F.lit(seed + ":"), F.col(id_col).cast("string"))
        ).cast("double")
        + F.lit(0.5)
    ) / F.lit(_MD5_SPAN)
    extra = F.when(u < F.col("frac"), 1).otherwise(0)
    return (
        docs.select(
            F.col(id_col),
            F.col(source_col).alias("source"),
            tok.cast("long").alias("n_tokens"),
        )
        .join(factors, "source")
        .select(
            id_col,
            "source",
            "n_tokens",
            (F.col("base_copies") + extra).cast("long").alias("n_copies"),
        )
        .filter(F.col("n_copies") >= 1)
    )
