"""Politeness scheduling — THE core new operator (SURVEY.md §2 Part B).

The reference's politeness story is just a global in-flight cap
(``scanner.py:430-440``); the north_rule requires a host-keyed priority
queue with robots budgets.  Spark-first shape:

* robots is a small per-host table -> **broadcast join** (no shuffle);
* the per-host budget is a **window top-k**:
  ``row_number() over (partition by host order by priority, url_hash)``
  — deterministic crawl order (wave, priority, url_hash) falls out of the
  same window;
* hot-host skew in the *fetch* stage is handled by salted repartitioning:
  ``repartition(P, host, pmod(url_hash, salt))`` spreads a hot host across
  ``salt`` partitions while keeping unrelated hosts co-located (SURVEY §4
  O12).  The dedup join's skew is AQE's job (skewJoin enabled in the
  session factory).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def politeness_schedule(
    df: DataFrame,
    robots: DataFrame | None,
    default_budget: int,
    host_col: str = "host",
    path_col: str = "path",
    pre_salt: int = 16,
) -> DataFrame:
    """Adds ``sched_rank`` (1-based per-host rank in crawl order) and
    ``scheduled`` (rank <= budget); drops robots-disallowed paths.

    Callers split on ``scheduled``: selected rows fetch this wave, the rest
    stay in the frontier (budget-deferred, re-ranked next wave).

    Hot-host scale shape (``pre_salt > 1``): a single window over
    ``partitionBy(host)`` sorts one hot host's 10^8 pending URLs in ONE
    task.  Instead, a salted local top-k — ``row_number() over (host,
    pmod(url_hash, pre_salt))`` ≤ budget — prunes each host to at most
    ``pre_salt × budget`` survivor rows first, and the exact per-host
    window runs over survivors only.  This is EXACT for the decision that
    matters: a row with true per-host rank ≤ budget has local rank ≤ budget
    in its salt bucket (its global superiors are a superset of its bucket
    superiors), so every truly-scheduled row survives pruning; conversely a
    pruned row has ≥ budget superiors in its own bucket alone, so its true
    rank > budget.  ``scheduled`` is therefore identical to the unsalted
    window (property-tested); ``sched_rank`` is exact for scheduled rows
    (all their superiors survive too) and NULL for pre-pruned rows —
    deferred rows are re-ranked next wave anyway.
    """
    if robots is not None:
        r = F.broadcast(
            robots.select(
                F.col("host").alias("_rhost"),
                F.col("per_wave_budget").alias("_budget"),
                F.col("disallow").alias("_disallow"),
            )
        )
        df = df.join(r, df[host_col] == F.col("_rhost"), "left").drop("_rhost")
        df = df.filter(
            F.col("_disallow").isNull()
            | ~F.exists(
                F.col("_disallow"),
                lambda p: F.col(path_col).startswith(p),
            )
        )
        budget = F.coalesce(F.col("_budget"), F.lit(default_budget))
    else:
        budget = F.lit(default_budget)

    order = [F.col("priority"), F.col("url_hash")]
    if pre_salt and pre_salt > 1:
        wl = Window.partitionBy(
            F.col(host_col), F.pmod(F.col("url_hash"), F.lit(pre_salt))
        ).orderBy(*order)
        df = df.withColumn("_lr", F.row_number().over(wl))
        survivors = df.filter(F.col("_lr") <= budget)
        pruned = (
            df.filter(F.col("_lr") > budget)
            .withColumn("sched_rank", F.lit(None).cast("int"))
            .withColumn("scheduled", F.lit(False))
        )
        w = Window.partitionBy(host_col).orderBy(*order)
        survivors = survivors.withColumn("sched_rank", F.row_number().over(w))
        survivors = survivors.withColumn("scheduled", F.col("sched_rank") <= budget)
        df = survivors.unionByName(pruned).drop("_lr")
    else:
        w = Window.partitionBy(host_col).orderBy(*order)
        df = df.withColumn("sched_rank", F.row_number().over(w))
        df = df.withColumn("scheduled", F.col("sched_rank") <= budget)
    return df.drop("_budget", "_disallow")


def salted_repartition(
    df: DataFrame, partitions: int, salt_buckets: int, host_col: str = "host"
) -> DataFrame:
    """Fetch-stage layout: co-locate by host but fan hot hosts out over
    ``salt_buckets`` partitions (politeness budgets were already applied
    upstream, so spreading a host does not break them)."""
    salt = F.pmod(F.col("url_hash"), F.lit(salt_buckets))
    return df.repartition(partitions, F.col(host_col), salt)
