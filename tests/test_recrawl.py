"""Recrawl scheduling: sitemap lastmod vs the seen table
(operators/recrawl.py)."""

from pyspark.sql import functions as F

from httpz_spark.operators.recrawl import recrawl_candidates


def _seeds(spark):
    return spark.createDataFrame(
        [
            ("h.test", "https://h.test/a", "2026-03-05", 0.9),
            ("h.test", "https://h.test/b", "2026-03-01", None),
            ("h.test", "https://h.test/c", None, 0.5),
            ("h.test", "https://h.test/d", "2026-02-01", None),
            ("h.test", "https://h.test/e", "2026-02-01", None),
        ],
        "host string, loc string, lastmod string, sm_priority double",
    )


def test_recrawl_classification(spark):
    seen = spark.createDataFrame(
        [
            ("https://h.test/a", "2026-03-01"),  # advertised newer -> stale
            ("https://h.test/b", "2026-03-01"),  # equal -> fresh (dropped)
            ("https://h.test/c", "2026-01-01"),  # seed has no lastmod -> fresh
            ("https://h.test/d", None),          # no recorded lastmod -> stale
        ],
        "url string, lastmod string",
    )
    got = {r["loc"]: r["recrawl_reason"]
           for r in recrawl_candidates(_seeds(spark), seen).collect()}
    assert got == {
        "https://h.test/a": "stale",
        "https://h.test/d": "stale",
        "https://h.test/e": "new",
    }


def test_recrawl_cold_start_all_new(spark):
    got = recrawl_candidates(_seeds(spark), None)
    assert got.count() == 5
    assert got.filter(F.col("recrawl_reason") != "new").count() == 0


def test_recrawl_plan_is_single_broadcastable_join(spark):
    seen = spark.createDataFrame([("https://h.test/a", "2026-01-01")],
                                 "url string, lastmod string")
    plan = (recrawl_candidates(_seeds(spark), F.broadcast(seen))
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Join") == 1 and "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
