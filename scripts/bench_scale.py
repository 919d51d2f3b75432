#!/usr/bin/env python3
"""Multi-scale bench for the document/embedding contract queries
(round-3 verdict #3: all query timings were single-scale at sf0.1, so
shuffle-size effects — the ngram candidate join, CC round counts on a
bigger dup graph — were unmeasured).

Builds a deterministic Nx-scale copy of the sf0.1 ``documents`` /
``embeddings`` tables (default N=10) under ``benchdata/x<N>/`` and times
the heavy queries at both scales in the same session, reporting the
time ratio per query (linear ops should land near N; anything clearly
super-linear is flagged).

Replica construction (replica 0 is the original data verbatim):

* documents: every word gets a per-replica suffix (``w -> w_r<k>``), so a
  replica shares ZERO shingles with any other — the within-replica dup/
  cluster structure is preserved exactly and the global workload (shingle
  groups, candidate pairs, components) scales by exactly N.  doc_id
  offset by k*1_000_000.
* embeddings: dimensions rolled by k positions — within-replica cosine
  structure identical, cross-replica correlations broken.  vec_id offset
  likewise.

Usage::

    python scripts/bench_scale.py [N] [--write]   # --write appends to BENCH/BASELINE.md
    python scripts/bench_scale.py 100 --queries ngram_jaccard_dups,minhash_lsh_dups --write
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

QUERIES = [
    "exact_dedup", "text_stats", "lang_id", "winnow_fingerprints",
    "ngram_jaccard_dups", "minhash_lsh_dups", "simhash_near_dups",
    "dedup_clusters", "training_shard", "training_shard_substr",
    "gopher_quality", "winnow_dup_pairs",
    "cosine_topk", "lsh_ann_topk", "ivf_ann_topk", "pq_ann_topk", "ivfpq_ann_topk",
    "embedding_near_dups",
    # round-6 curation / C4 / capstone (word suffixes keep each replica's
    # span + shingle structure disjoint; the shared C4 header is the one
    # deliberate cross-replica dup family)
    "pii_scrub", "domain_mix", "seq_pack", "image_pair_filter",
    "c4_line_filters", "c4_clean", "training_shard_curated",
    # round-6 session 7: WARC framing family (map-only natives + the
    # surt_cdx / revisit windows — replicas add disjoint urls/surt keys)
    "warc_records", "surt_cdx", "warc_revisit", "wet_records",
    "wat_records",
]


def build_scale_data(spark, n: int, out_dir: str) -> None:
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    embs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    doc_parts = []
    emb_parts = []
    for r in range(n):
        if r == 0:
            doc_parts.append(docs)
            emb_parts.append(embs)
            continue
        doc_parts.append(docs.select(
            (F.col("doc_id") + r * 1_000_000).alias("doc_id"),
            F.regexp_replace("text", r"(\S+)", f"$1_r{r}").alias("text"),
            "lang", "source", "n_chars",
        ))
        dim = F.size("embedding")
        shift = F.pmod(F.lit(r), dim)  # r can exceed dim at large N
        emb_parts.append(embs.select(
            (F.col("vec_id") + r * 1_000_000).alias("vec_id"),
            F.when(shift == 0, F.col("embedding")).otherwise(F.concat(
                F.slice("embedding", shift + 1, dim - shift),
                F.slice("embedding", 1, shift),
            )).alias("embedding"),
            "label",
        ))
    out_docs = doc_parts[0]
    for p in doc_parts[1:]:
        out_docs = out_docs.unionByName(p)
    out_embs = emb_parts[0]
    for p in emb_parts[1:]:
        out_embs = out_embs.unionByName(p)
    out_docs.repartition(32).write.mode("overwrite").parquet(
        f"{out_dir}/documents.parquet")
    out_embs.repartition(32).write.mode("overwrite").parquet(
        f"{out_dir}/embeddings.parquet")


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 10
    write = "--write" in sys.argv
    queries = QUERIES
    if "--queries" in sys.argv:
        wanted = sys.argv[sys.argv.index("--queries") + 1].split(",")
        queries = [q for q in QUERIES if q in wanted]
    out_dir = os.path.join(REPO, "benchdata", f"x{n}")

    from httpz_spark.session import get_spark

    spark = get_spark(
        app_name="httpz_scale_bench", master="local[32]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.enabled": "false",
                    "spark.driver.memory": "8g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    if not os.path.exists(f"{out_dir}/documents.parquet"):
        build_scale_data(spark, n, out_dir)
    n_docs = spark.read.parquet(f"{out_dir}/documents.parquet").count()
    n_embs = spark.read.parquet(f"{out_dir}/embeddings.parquet").count()
    print(f"x{n} data: {n_docs:,} docs, {n_embs:,} embeddings", flush=True)

    import __spark_entry__ as E

    qs = E.queries()
    results = {}
    for name in queries:
        row = {}
        for label, sf in (("x1", SF_DIR), (f"x{n}", out_dir)):
            # time a noop write (materializes EVERY column — a bare
            # count() lets Catalyst prune map-only projections down to a
            # file scan, under-measuring the regex/array kernels); the
            # row count is taken untimed afterwards
            t0 = time.time()
            qs[name](spark, sf).write.format("noop").mode("overwrite").save()
            sec = round(time.time() - t0, 2)
            out_rows = qs[name](spark, sf).count()
            row[label] = {"sec": sec, "rows": out_rows}
        row["ratio"] = round(row[f"x{n}"]["sec"] / max(row["x1"]["sec"], 1e-9), 1)
        results[name] = row
        print(f"{name}: x1 {row['x1']['sec']}s ({row['x1']['rows']} rows) | "
              f"x{n} {row[f'x{n}']['sec']}s ({row[f'x{n}']['rows']} rows) | "
              f"ratio {row['ratio']}", flush=True)
    print(json.dumps({"scale": n, "load_avg": os.getloadavg()[0],
                      "results": results}))

    if write:
        lines = [
            f"\n## Contract-query scaling: sf0.1 vs {n}x documents/embeddings "
            f"(scripts/bench_scale.py, local[32])\n\n",
            f"{n}x data = {n} suffix-disjoint replicas ({n_docs:,} docs / "
            f"{n_embs:,} vectors): within-replica dup/ANN structure identical "
            f"to sf0.1, global workload exactly {n}x.  Time ratios near "
            f"{n} = linear scaling; the shuffle-heavy queries are the ones "
            "to watch.\n\n",
            f"| query | sf0.1 sec | {n}x sec | ratio (ideal ~{n}) | output rows x1 -> x{n} |\n",
            "|---|---|---|---|---|\n",
        ]
        for name, row in results.items():
            lines.append(
                f"| {name} | {row['x1']['sec']} | {row[f'x{n}']['sec']} | "
                f"{row['ratio']} | {row['x1']['rows']:,} -> "
                f"{row[f'x{n}']['rows']:,} |\n"
            )
        with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
            f.writelines(lines)
        print("appended to BENCH/BASELINE.md")
    spark.stop()


if __name__ == "__main__":
    main()
