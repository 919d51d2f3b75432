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
) -> DataFrame:
    """Adds ``sched_rank`` (1-based per-host rank in crawl order) and
    ``scheduled`` (rank <= budget); drops robots-disallowed paths.

    Callers split on ``scheduled``: selected rows fetch this wave, the rest
    stay in the frontier (budget-deferred, re-ranked next wave).
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

    w = Window.partitionBy(host_col).orderBy(F.col("priority"), F.col("url_hash"))
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
