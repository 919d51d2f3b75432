"""Aspect-ratio bucket batching (operators/curation.py) — the image
training-batch analogue of seq_pack."""

import pytest

from httpz_spark.operators.curation import ASPECT_BUCKETS, aspect_bucket_batches


def _imgs(spark, rows):
    return spark.createDataFrame(rows, "image_id string, w int, h int")


def test_bucket_assignment(spark):
    rows = [
        ("sq", 512, 512),        # 1:1
        ("hd", 1920, 1080),      # 16:9
        ("port", 1080, 1920),    # 9:16
        ("photo", 600, 400),     # 3:2
        ("tall", 400, 800),      # 1:2
    ]
    out = {
        r["image_id"]: (r["bucket_w"], r["bucket_h"])
        for r in aspect_bucket_batches(_imgs(spark, rows), batch=8).collect()
    }
    assert out == {
        "sq": (1, 1), "hd": (16, 9), "port": (9, 16),
        "photo": (3, 2), "tall": (1, 2),
    }


def test_tie_breaks_to_first_listed(spark):
    # w=2, h=1 against buckets [(1,1), (3,1)]: |2.0 - 1.0| == |2.0 - 3.0|
    # exactly in doubles -> the FIRST-listed bucket must win
    rows = [("a", 2, 1)]
    out = aspect_bucket_batches(
        _imgs(spark, rows), batch=4, buckets=[(1, 1), (3, 1)]
    ).collect()
    assert out[0]["bucket_idx"] == 0
    assert (out[0]["bucket_w"], out[0]["bucket_h"]) == (1, 1)


def test_batches_cut_per_bucket_shard(spark):
    rows = [(f"i{k:02d}", 100, 100) for k in range(10)]  # all 1:1
    out = aspect_bucket_batches(
        _imgs(spark, rows), batch=2, n_shards=1
    ).collect()
    assert all(r["bucket_idx"] == 0 and r["shard"] == 0 for r in out)
    # 10 images / batch 2 -> batch ids 0..4, each exactly 2 members
    from collections import Counter
    c = Counter(r["batch_id"] for r in out)
    assert c == {0: 2, 1: 2, 2: 2, 3: 2, 4: 2}
    # deterministic: ordered by image_id within the shard
    by_batch = sorted(out, key=lambda r: (r["batch_id"], r["image_id"]))
    ids = [r["image_id"] for r in by_batch]
    assert ids == sorted(ids)


def test_shards_partition_batches(spark):
    rows = [(f"im{k}", 200, 100) for k in range(40)]
    out = aspect_bucket_batches(
        _imgs(spark, rows), batch=4, n_shards=4
    ).collect()
    assert {r["shard"] for r in out} <= set(range(4))
    # every (shard, batch) holds at most `batch` members
    from collections import Counter
    c = Counter((r["shard"], r["batch_id"]) for r in out)
    assert max(c.values()) <= 4
    assert all(r["bucket_w"] == 2 and r["bucket_h"] == 1 for r in out)


def test_validation(spark):
    df = _imgs(spark, [("a", 1, 1)])
    with pytest.raises(ValueError):
        aspect_bucket_batches(df, batch=0)
    with pytest.raises(ValueError):
        aspect_bucket_batches(df, buckets=[])
