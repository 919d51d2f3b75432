"""Host-graph PageRank frontier priority (operators/linkrank.py)."""

import pytest
from pyspark.sql import functions as F

from httpz_spark.operators import linkrank as LR


def _pr_model(edges, d=0.85, iters=3):
    """Pure-python replica of the quantized power iteration."""
    nodes = sorted({s for s, _ in edges} | {t for _, t in edges})
    out = {}
    for s, _ in edges:
        out[s] = out.get(s, 0) + 0
    eset = sorted(set(edges))
    odeg = {}
    for s, _ in eset:
        odeg[s] = odeg.get(s, 0) + 1
    n = len(nodes)
    rank = {h: round(1.0 / n, 9) for h in nodes}
    for _ in range(iters):
        dm = sum(r for h, r in rank.items() if h not in odeg)
        contrib = {}
        for s, t in eset:
            contrib[t] = contrib.get(t, 0.0) + round(rank[s] / odeg[s], 9)
        base = (1.0 - d) / n + d * dm / n
        rank = {h: round(base + d * contrib.get(h, 0.0), 9) for h in nodes}
    return rank


def _edges_df(spark, edges):
    return spark.createDataFrame(edges, "src string, dst string")


def test_cycle_is_uniform(spark):
    e = _edges_df(spark, [("a", "b"), ("b", "c"), ("c", "a")])
    r = {row["host"]: row["rank"] for row in LR.host_pagerank(e).collect()}
    assert len(r) == 3
    assert max(r.values()) - min(r.values()) < 1e-9
    assert abs(sum(r.values()) - 1.0) < 1e-6


def test_star_hub_ranks_highest(spark):
    e = _edges_df(
        spark,
        [("b", "a"), ("c", "a"), ("d", "a"), ("a", "b")],
    )
    r = {row["host"]: row["rank"] for row in LR.host_pagerank(e).collect()}
    assert r["a"] > r["b"] > r["c"] == r["d"]


def test_dangling_mass_redistributes(spark):
    # d has no out-links: its rank must not evaporate
    e = _edges_df(spark, [("a", "b"), ("b", "d"), ("a", "d")])
    r = {row["host"]: row["rank"] for row in LR.host_pagerank(e).collect()}
    assert abs(sum(r.values()) - 1.0) < 1e-6
    assert r["d"] > r["b"]  # two in-links beat one


def test_matches_python_model(spark):
    edges = [
        ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
        ("d", "a"), ("d", "c"), ("e", "d"), ("c", "e"),
    ]
    want = _pr_model(edges)
    got = {
        row["host"]: row["rank"]
        for row in LR.host_pagerank(_edges_df(spark, edges)).collect()
    }
    assert set(got) == set(want)
    for h in want:
        assert got[h] == pytest.approx(want[h], abs=1e-8)


def test_deterministic_across_runs(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "b"), ("d", "a")]
    e = _edges_df(spark, edges)
    r1 = sorted(tuple(r) for r in LR.host_pagerank(e).collect())
    r2 = sorted(
        tuple(r)
        for r in LR.host_pagerank(e.repartition(7)).collect()
    )
    assert r1 == r2  # decimal-quantized sums: partitioning-independent


def test_rank_priority_bands(spark):
    e = _edges_df(
        spark,
        [("b", "a"), ("c", "a"), ("d", "a"), ("a", "b"), ("c", "d")],
    )
    pr = LR.rank_priority(LR.host_pagerank(e), bands=2)
    rows = {r["host"]: r for r in pr.collect()}
    assert rows["a"]["priority"] == 0  # hub crawls first
    assert max(r["priority"] for r in rows.values()) == 1


def test_empty_and_validation(spark):
    e = _edges_df(spark, []).filter(F.lit(False))
    assert LR.host_pagerank(e).count() == 0
    with pytest.raises(ValueError):
        LR.host_pagerank(e, iters=0)
