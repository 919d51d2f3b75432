"""SemDeDup (semantic dedup over embedding clusters) — operator tests.

Ground truth on constructed data: near-dup pairs exist only between a
vector and its deterministic perturbed variant, so the expected pair set,
component structure, and keep rule are all checkable exactly.
"""

import os

import pytest
from pyspark.sql import functions as F

from httpz_spark.operators.semdedup import (
    semantic_dup_pairs,
    semdedup,
    semdedup_cell_sizes,
)

SF_DIR = os.environ.get("HTTPZ_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def emb_with_variants(spark):
    e = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    base = e.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    var = base.filter(F.col("vec_id") % 3 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("embedding", lambda x: x * 0.9 + 0.03).alias("embedding"),
    )
    return base.unionByName(var).localCheckpoint()


def test_pairs_are_variant_pairs_only(emb_with_variants):
    """Random 64-dim embeddings have cosine << 0.7 between distinct base
    vectors — every surviving pair must be (v, v+100000)."""
    pairs = semantic_dup_pairs(emb_with_variants, tau=0.7, n_clusters=8).collect()
    assert len(pairs) > 20
    for r in pairs:
        assert r["b"] == r["a"] + 100000
        assert r["cos"] >= 0.7


def test_pairs_respect_cell_boundary(emb_with_variants):
    """A (v, variant) pair appears ONLY when both land in the same cell —
    the paper's within-cluster-only rule."""
    from httpz_spark.operators.similarity import _centroid_arrays, ivf_assign

    cents = _centroid_arrays(emb_with_variants, "vec_id", "embedding", 8)
    cells = {
        r["vec_id"]: r["cell"]
        for r in ivf_assign(emb_with_variants, cents).select("vec_id", "cell").collect()
    }
    got = {(r["a"], r["b"]) for r in
           semantic_dup_pairs(emb_with_variants, tau=0.7, n_clusters=8,
                              centroids=cents).collect()}
    for (a, b) in got:
        assert cells[a] == cells[b]
    # and some variant pair is EXCLUDED because the perturbation moved it
    # across a cell boundary (non-trivial cell rule)
    split = [v for v in cells if v < 100000 and v % 3 == 0
             and v + 100000 in cells and cells[v] != cells[v + 100000]]
    for v in split:
        assert (v, v + 100000) not in got


def test_keep_rule_lowest_centroid_cos(emb_with_variants):
    out = semdedup(emb_with_variants, tau=0.7, n_clusters=8)
    rows = out.collect()
    assert rows
    by_keeper = {}
    for r in rows:
        by_keeper.setdefault(r["keeper"], []).append(r)
    for keeper, members in by_keeper.items():
        best = min(members, key=lambda r: (r["cent_cos"], r["id"]))
        assert best["id"] == keeper


def test_cell_cap_drops_fat_cells_loudly(spark, emb_with_variants):
    sizes = {r["cell"]: r["n"] for r in
             semdedup_cell_sizes(emb_with_variants, n_clusters=8).collect()}
    fat = max(sizes, key=lambda c: sizes[c])
    cap = sizes[fat] - 1
    from httpz_spark.operators.similarity import _centroid_arrays, ivf_assign

    cents = _centroid_arrays(emb_with_variants, "vec_id", "embedding", 8)
    capped = semantic_dup_pairs(emb_with_variants, tau=0.7, n_clusters=8,
                                centroids=cents, cell_cap=cap)
    assert capped.filter(F.col("cell") == fat).count() == 0
    # uncapped has pairs in that cell (the cap actually did something)
    full = semantic_dup_pairs(emb_with_variants, tau=0.7, n_clusters=8,
                              centroids=cents)
    assert full.filter(F.col("cell") == fat).count() > 0
    # and the capped result is exactly the uncapped minus the fat cell
    got = {(r["a"], r["b"]) for r in capped.collect()}
    want = {(r["a"], r["b"]) for r in full.filter(F.col("cell") != fat).collect()}
    assert got == want


def test_trained_centroids_path_runs(emb_with_variants):
    """train=True swaps in the k-means quantizer; the dup-pair semantics
    (variant pairs only) must hold there too."""
    pairs = semantic_dup_pairs(emb_with_variants, tau=0.7, n_clusters=8,
                               train=True).collect()
    assert pairs
    for r in pairs:
        assert r["b"] == r["a"] + 100000
