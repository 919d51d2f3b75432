"""Image-axis training-shard assembly: caption + perceptual-hash dedup.

The graft cell's payload is image+caption pairs (BASELINE.json
input_hint); a multimodal training shard must collapse BOTH duplicate
classes before the data ships:

* **caption-exact duplicates** — the same caption re-posted with a
  different image encoding (mirrors, reposts, hotlink copies);
* **pixel near-duplicates** — re-encodes/crops of the same picture,
  which land within a few pHash bits of each other.

The two signals are edges over the same id space, so the shard is one
connected-components pass over their union: caption groups contribute
STAR edges (every member links to the group's min id — O(n) edges, never
the quadratic within-group expansion, which matters when one caption has
10^5 copies), pHash contributes the banded hamming pairs from
:func:`httpz_spark.operators.dedup.phash_near_pairs` (never all-pairs).
Survivors are each cluster's minimum id, the same keep-rule as the text
``training_shard`` capstone; ``dup_count`` records how many rows each
survivor absorbed (weighting signal for samplers).

REAL-SQL-oracled end to end (★image_training_shard): DuckDB re-derives
the caption groups, brute-force ``bit_count(xor())`` hamming pairs, the
recursive-CTE components, and the keep-rule over a golden copy of the
input frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from httpz_spark.operators.dedup import dedup_clusters, phash_near_pairs


def caption_dup_edges(
    images: DataFrame,
    id_col: str = "image_id",
    caption_col: str = "caption",
) -> DataFrame:
    """(a, b) star edges linking every caption-duplicate to its group's
    min id.  Groups shuffle on ``xxhash64(caption)`` (a fixed 8-byte
    key, not the caption text — captions can be kilobytes), the
    ``exact_dedup`` discipline with a 4x narrower key than the old
    md5-hex string (and a far cheaper hash to evaluate twice);
    singleton captions drop before the join back, so the edge frame is
    proportional to the duplicated subset."""
    key = F.xxhash64(F.col(caption_col)).alias("_ck")
    groups = (
        images.select(key, F.col(id_col))
        .groupBy("_ck")
        .agg(F.min(id_col).alias("_keep"), F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > 1)
        .select("_ck", "_keep")
    )
    return (
        images.select(key, F.col(id_col))
        .join(groups, "_ck")
        .filter(F.col(id_col) != F.col("_keep"))
        .select(F.col("_keep").alias("a"), F.col(id_col).alias("b"))
    )


def image_training_shard(
    images: DataFrame,
    id_col: str = "image_id",
    caption_col: str = "caption",
    phash_col: str = "phash",
    max_hamming: int = 2,
) -> DataFrame:
    """The deduplicated image shard: input columns of the surviving rows
    plus ``dup_count`` (rows absorbed, >= 1).  One CC pass over the union
    of caption-star and pHash-banded edges; survivors via a single
    anti-join of the (small) drop list against the corpus."""
    edges = caption_dup_edges(images, id_col, caption_col).unionByName(
        phash_near_pairs(images, phash_col, id_col,
                         max_hamming=max_hamming).select("a", "b")
    )
    comp = dedup_clusters(edges)  # (id, canonical) for ids in any pair
    sizes = comp.groupBy("canonical").agg(
        F.count(F.lit(1)).alias("dup_count"))
    drops = comp.filter(F.col("id") != F.col("canonical")).select("id")
    return (
        images.join(drops, images[id_col] == drops["id"], "left_anti")
        .join(sizes, images[id_col] == sizes["canonical"], "left")
        .drop("canonical")
        .withColumn("dup_count", F.coalesce("dup_count", F.lit(1)))
    )
