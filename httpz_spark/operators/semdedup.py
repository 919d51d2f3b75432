"""SemDeDup — semantic deduplication over an embedding column
(Abbas et al. 2023, "SemDeDup: Data-efficient learning at web-scale
through semantic deduplication", arXiv:2303.09540).

The pipeline shape the paper runs over LAION/C4 embeddings:

1. k-means-cluster the corpus embeddings (the coarse quantizer is shared
   with IVF ANN — :func:`httpz_spark.operators.similarity.ivf_assign`);
2. WITHIN each cluster, find pairs with cosine similarity above ``tau``
   (the paper's ``1 - eps``) — never across clusters, so the candidate
   join is an equi-join on ``cell``, not an all-pairs cross join;
3. group the duplicate pairs into connected components and KEEP exactly
   one member per component — the paper keeps the example with the LOWEST
   cosine similarity to its cluster centroid (the least-redundant
   "edge" example), everything else drops.

Scale shape (the part that matters at 10^9 embeddings):

* Cell assignment is a map-only projection (literal centroids) or one
  Arrow-batched numpy matmul per batch (large centroid counts) —
  :func:`similarity.ivf_assign`'s two physical strategies.
* The pairwise stage shuffles ONCE on ``cell`` and compares only within a
  cell: expected cell size is n/k, so cost is n²/k, tuned by k (the paper
  uses k=50,000 for LAION-440M — cells of ~9k rows).  A hot cell is
  bounded by ``cell_cap`` (drop cells larger than the cap loudly rather
  than detonate a quadratic join — the paper's clusters are size-capped
  by construction).
* Components + keep-rule ride the existing
  :func:`httpz_spark.operators.dedup.dedup_clusters` substrate (O(log n)
  rounds, checkpoint-released).

Reference analogue: none — the httpz scanner has no embedding surface;
this is a training-data-pipeline operator grafted onto the engine's
similarity substrate (SURVEY.md §2 training-data family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from httpz_spark.operators.dedup import dedup_clusters
from httpz_spark.operators.similarity import (
    _centroid_arrays,
    cosine_expr,
    ivf_assign,
    train_centroids,
)


def _with_cells(
    embeddings: DataFrame,
    centroids: list | None,
    n_clusters: int,
    train: bool,
    id_col: str,
    vec_col: str,
) -> tuple[DataFrame, list]:
    if centroids is None:
        if train:
            centroids = train_centroids(embeddings, n_clusters, id_col, vec_col)
        else:
            centroids = _centroid_arrays(embeddings, id_col, vec_col, n_clusters)
    return ivf_assign(embeddings, centroids, vec_col), centroids


def semantic_dup_pairs(
    embeddings: DataFrame,
    tau: float = 0.95,
    n_clusters: int = 8,
    centroids: list | None = None,
    train: bool = False,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_cap: int | None = None,
) -> DataFrame:
    """``(a, b, cell, cos)`` — within-cluster pairs with cosine >= ``tau``
    (a < b).  One shuffle on ``cell``; exact cosine inside the cell only.

    ``cell_cap``: if set, cells with more than ``cell_cap`` members are
    EXCLUDED from pairing (both sides) — the loud, bounded behavior for a
    degenerate quantizer; callers see the skipped mass via the
    ``semdedup_cell_sizes`` helper rather than a silent quadratic blowup.
    """
    assigned, _ = _with_cells(embeddings, centroids, n_clusters, train,
                              id_col, vec_col)
    lhs = assigned.select(
        F.col(id_col).alias("a"), F.col("cell"), F.col(vec_col).alias("_va")
    )
    rhs = assigned.select(
        F.col(id_col).alias("b"), F.col("cell"), F.col(vec_col).alias("_vb")
    )
    if cell_cap is not None:
        sizes = assigned.groupBy("cell").count().filter(F.col("count") <= cell_cap)
        keep_cells = F.broadcast(sizes.select("cell"))
        lhs = lhs.join(keep_cells, "cell")
        rhs = rhs.join(keep_cells, "cell")
    return (
        lhs.join(rhs, "cell")
        .filter(F.col("a") < F.col("b"))
        .select(
            "a", "b", "cell",
            cosine_expr(F.col("_va"), F.col("_vb")).alias("cos"),
        )
        .filter(F.col("cos") >= F.lit(float(tau)))
    )


def semdedup_cell_sizes(
    embeddings: DataFrame,
    n_clusters: int = 8,
    centroids: list | None = None,
    train: bool = False,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """``(cell, n)`` cluster occupancy — the skew observability surface
    for picking ``n_clusters``/``cell_cap``."""
    assigned, _ = _with_cells(embeddings, centroids, n_clusters, train,
                              id_col, vec_col)
    return assigned.groupBy("cell").agg(F.count("*").alias("n"))


def semdedup(
    embeddings: DataFrame,
    tau: float = 0.95,
    n_clusters: int = 8,
    centroids: list | None = None,
    train: bool = False,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_cap: int | None = None,
    cc_algorithm: str = "auto",
) -> DataFrame:
    """``(id, keeper, cent_cos)`` for every embedding that appears in a
    semantic-duplicate pair: ``keeper`` is the component member with the
    LOWEST cosine to its cluster centroid (ties by smallest id) — the
    paper's keep rule — and ``cent_cos`` is the member's own
    centroid-cosine.  Rows in no pair are implicitly kept and not emitted
    (same contract as :func:`dedup.dedup_clusters`).

    Drop-list for a pipeline: ``semdedup(...).filter("id != keeper")``.
    """
    assigned, cents = _with_cells(embeddings, centroids, n_clusters, train,
                                  id_col, vec_col)
    pairs = semantic_dup_pairs(
        assigned, tau, n_clusters, cents, False, id_col, vec_col, cell_cap
    )
    comp = dedup_clusters(pairs.select("a", "b"), algorithm=cc_algorithm)

    # cosine of each member to ITS OWN assigned centroid — a map-only
    # rewrite over the already-assigned frame (literal centroid arrays
    # indexed by the cell column; element_at is 1-based)
    cent_arr = F.array(*[
        F.array(*[F.lit(float(x)) for x in c]) for c in cents
    ])
    member_cos = assigned.select(
        F.col(id_col).alias("id"),
        cosine_expr(
            F.col(vec_col), F.element_at(cent_arr, F.col("cell") + 1)
        ).alias("cent_cos"),
    )
    scored = comp.join(member_cos, "id")
    keep = (
        scored.groupBy("canonical")
        .agg(F.min_by(F.col("id"), F.struct(F.col("cent_cos"), F.col("id")))
             .alias("keeper"))
    )
    return (
        scored.join(keep, "canonical")
        .select("id", "keeper", "cent_cos")
    )
