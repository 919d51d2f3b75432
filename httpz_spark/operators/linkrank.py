"""Host-graph PageRank as a crawl-frontier priority signal.

The reference scanner crawls in submission order (its asyncio queue —
`/root/reference/httpz_scanner/scanner.py` producer/consumer); the
engine's frontier already schedules by an explicit priority column
(`plans/frontier.py:urls_to_frontier`).  This module computes the
classic principled source for that priority: PageRank (Page et al.
1999) over the OBSERVED host link graph — hosts linked from many
well-linked hosts get crawled first, the scheduling rule production
crawlers have used since Mercator/Heritrix.

Spark-first shape — each power iteration is exactly:

* one equi-join of the edge list against the current rank vector on
  ``src`` (ranks are |hosts| rows; Spark broadcasts them while small,
  sort-merge at web scale), and
* one map-side-combined ``groupBy(dst)`` summing the contributions.

Dangling mass (hosts with no out-links) is redistributed uniformly —
computed as ONE scalar aggregate per iteration, never a cross join.
Iteration count is FIXED (default 3): at frontier-scheduling precision
a handful of iterations dominates the signal, the loop unrolls into a
static DAG (no driver-side convergence check reading the cluster each
round), and the DuckDB oracle can replay the identical unrolled CTE
chain.

Determinism: per-edge contributions are quantized to DECIMAL(20,9)
BEFORE the sum (decimal addition is exact and order-independent, so
results are bit-stable across partitionings and engines); the rank
update arithmetic is +,*,/ on doubles (IEEE-exact, libm-free) rounded
to 9 decimals per iteration.

Scale note: rank state between iterations is ``localCheckpoint``ed
(eager) and the previous round's state released via
``storage.release_local_checkpoint`` — the same discipline as
connected components; without a barrier, iteration k's plan would
re-execute every earlier join (Catalyst has no common-subplan reuse
across actions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from httpz_spark.storage import release_local_checkpoint


def host_pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iters: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """``(host, rank)`` after ``iters`` power iterations over the
    distinct edge list.  Ranks sum to ~1 (up to quantization); isolated
    destinations and dangling sources are handled per the standard
    uniform-redistribution rule."""
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    e = (
        edges.select(
            F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
        )
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("src").alias("host"))
        .unionByName(e.select(F.col("dst").alias("host")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        release_local_checkpoint(e)
        release_local_checkpoint(nodes)
        # a fresh empty frame — never derive the result from released
        # checkpoint blocks (they cannot be recomputed)
        return edges.sparkSession.createDataFrame(
            [], "host string, rank double"
        )
    outdeg = (
        e.groupBy("src")
        .agg(F.count("*").alias("odeg"))
        .localCheckpoint(eager=True)
    )
    d = float(damping)
    rank = nodes.select(
        "host", F.round(F.lit(1.0 / n), 9).cast("decimal(20,9)").alias("rank")
    ).localCheckpoint(eager=True)
    for _ in range(iters):
        r = rank.join(outdeg, rank["host"] == outdeg["src"], "left").select(
            rank["host"].alias("host"), "rank", "odeg"
        )
        # dangling mass: total rank parked on hosts with no out-links
        dm = (
            r.filter(F.col("odeg").isNull())
            .agg(F.sum("rank").alias("m"))
            .collect()[0]["m"]
        )
        dm = float(dm or 0.0)
        contrib = (
            e.join(r.filter(F.col("odeg").isNotNull()), e["src"] == r["host"])
            .select(
                "dst",
                F.round(
                    F.col("rank").cast("double") / F.col("odeg"), 9
                ).cast("decimal(20,9)").alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        base = (1.0 - d) / n + d * dm / n
        new_rank = (
            nodes.join(contrib, nodes["host"] == contrib["dst"], "left")
            .select(
                "host",
                F.round(
                    F.lit(base)
                    + F.lit(d)
                    * F.coalesce(F.col("s").cast("double"), F.lit(0.0)),
                    9,
                ).cast("decimal(20,9)").alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
        release_local_checkpoint(rank)
        rank = new_rank
    # the final eager rank checkpoint is the only storage left pinned
    # (it IS the result); everything intermediate is released
    out = rank.select("host", F.col("rank").cast("double").alias("rank"))
    release_local_checkpoint(e)
    release_local_checkpoint(nodes)
    release_local_checkpoint(outdeg)
    return out


def rank_priority(
    ranks: DataFrame, bands: int = 8, host_col: str = "host"
) -> DataFrame:
    """``(host, rank, priority)`` — ranks quantile-banded into ``bands``
    priority levels (0 = highest rank = crawl first), the column
    ``urls_to_frontier(priority=...)`` consumes.  ntile is one window
    over the (|hosts|-sized, small-by-corpus-standards) rank table, not
    over the frontier."""
    from pyspark.sql import Window

    w = Window.orderBy(F.col("rank").desc(), F.col(host_col))
    return ranks.select(
        host_col,
        "rank",
        (F.ntile(bands).over(w) - 1).cast("int").alias("priority"),
    )
