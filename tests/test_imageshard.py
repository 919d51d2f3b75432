"""Image training shard: caption + pHash dedup (operators/imageshard.py)."""

from pyspark.sql import functions as F

from httpz_spark.operators.imageshard import (
    caption_dup_edges,
    image_training_shard,
)


def _images(spark):
    # img0/img1: caption dup, far phash; img2/img3: phash near (1 bit),
    # different captions; img3/img4: caption dup -> chain 2-3-4; img5 solo
    rows = [
        ("img0", "a red fox", 0x0000000000000000),
        ("img1", "a red fox", 0x7777777777777777),
        ("img2", "first caption", 0x00FF00FF00FF00F0),
        ("img3", "second caption", 0x00FF00FF00FF00F1),
        ("img4", "second caption", 0x1234567812345678),
        ("img5", "unique caption", 0x0F0F0F0F0F0F0F0F),
    ]
    return spark.createDataFrame(
        rows, "image_id string, caption string, phash long")


def test_caption_edges_are_star_shaped(spark):
    got = sorted(
        (r["a"], r["b"]) for r in caption_dup_edges(_images(spark)).collect()
    )
    assert got == [("img0", "img1"), ("img3", "img4")]


def test_shard_merges_both_signals(spark):
    out = image_training_shard(_images(spark), max_hamming=2)
    got = {r["image_id"]: r["dup_count"] for r in out.collect()}
    # cluster {img0, img1} -> img0; chain {img2, img3, img4} -> img2
    assert got == {"img0": 2, "img2": 3, "img5": 1}
    # survivors keep their own payload columns
    caps = {r["image_id"]: r["caption"]
            for r in out.select("image_id", "caption").collect()}
    assert caps["img2"] == "first caption"


def test_shard_no_dups_passthrough(spark):
    imgs = _images(spark).filter(F.col("image_id").isin("img2", "img5"))
    out = image_training_shard(imgs)
    got = {r["image_id"]: r["dup_count"] for r in out.collect()}
    assert got == {"img2": 1, "img5": 1}


def test_shard_plan_no_cartesian(spark):
    plan = (
        image_training_shard(_images(spark))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
