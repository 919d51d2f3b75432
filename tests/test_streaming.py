"""Streaming seed ingestion -> frontier -> crawl (foreachBatch wrapper)."""

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from httpz_spark.config import EngineConfig, ScanConfig
from httpz_spark.plans.frontier import CrawlEngine
from httpz_spark.sources import fabric as FB
from httpz_spark.sources import synthetic as S
from httpz_spark.streaming.micro import StreamingSeedIngest, ingest_and_crawl


@pytest.fixture(scope="module")
def world():
    return FB.FabricConfig(n_images=32, n_hosts=8).with_certs()


def make_engine(spark, world, state_dir):
    return CrawlEngine(
        spark, S.images_df(spark, world, 2), S.dns_df(spark, world),
        S.robots_df(spark, world), ScanConfig.all_on(),
        EngineConfig(partitions=8, per_host_budget=8, max_depth=1, salt_buckets=2),
        world, state_dir=state_dir,
    )


def test_streaming_ingest_then_crawl(spark, world):
    base = tempfile.mkdtemp(prefix="httpz_stream_")
    seed_dir = os.path.join(base, "seeds")
    os.makedirs(seed_dir)
    urls = S.seed_url_lines(world)
    half = len(urls) // 2
    with open(os.path.join(seed_dir, "batch1.txt"), "w") as f:
        f.write("\n".join(urls[:half]))
    try:
        eng = make_engine(spark, world, os.path.join(base, "state"))
        results = ingest_and_crawl(eng, seed_dir, os.path.join(base, "ckpt"), max_waves=2)
        n1 = results.count()
        assert n1 > 0

        # second micro-batch: new file with remaining + duplicate seeds;
        # duplicates must not be recrawled (seen anti-join)
        with open(os.path.join(seed_dir, "batch2.txt"), "w") as f:
            f.write("\n".join(urls))  # includes already-crawled half
        results2 = ingest_and_crawl(eng, seed_dir, os.path.join(base, "ckpt"), max_waves=4)
        n2 = results2.count()
        assert n2 > n1
        assert results2.select("url_hash").distinct().count() == n2
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_streaming_ingest_dedups_frontier(spark, world):
    base = tempfile.mkdtemp(prefix="httpz_stream2_")
    try:
        eng = make_engine(spark, world, os.path.join(base, "state"))
        ing = StreamingSeedIngest(eng)
        batch = spark.createDataFrame(
            [("https://h1.test/img00000001",), ("HTTPS://H1.TEST/img00000001#f",)],
            "value string",
        )
        ing.ingest_batch(batch, 0)
        fr = eng.store.read("frontier")
        assert fr.count() == 1  # canonicalization collapses both forms
    finally:
        shutil.rmtree(base, ignore_errors=True)
