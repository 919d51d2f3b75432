"""Frontier engine: waves, dedup, politeness, checkpoint/resume."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from httpz_spark.config import EngineConfig, ScanConfig
from httpz_spark.operators.frontier_dedup import dedup_unseen
from httpz_spark.plans.frontier import CrawlEngine, urls_to_frontier
from httpz_spark.sources import fabric as FB
from httpz_spark.sources import synthetic as S


@pytest.fixture(scope="module")
def world():
    return FB.FabricConfig(n_images=64, n_hosts=12).with_certs()


def make_engine(spark, world, state_dir, **eover):
    images = S.images_df(spark, world, partitions=4)
    dns = S.dns_df(spark, world)
    robots = S.robots_df(spark, world)
    scan_cfg = ScanConfig.all_on(discover_links=True)
    ecfg = EngineConfig(partitions=8, per_host_budget=4, max_depth=2,
                        salt_buckets=4, state_dir=state_dir, **eover)
    return CrawlEngine(spark, images, dns, robots, scan_cfg, ecfg, world,
                       state_dir=state_dir)


def seed_df(spark, world):
    return S.seeds_df(spark, S.seed_url_lines(world))


def table_fingerprint(df, cols):
    rows = [tuple(r) for r in df.select(*cols).collect()]
    return sorted(rows)


def test_bloom_dedup_equals_exact_antijoin(spark):
    from httpz_spark.operators.frontier_dedup import BloomIndex

    cand = spark.range(0, 5000).select(
        (F.col("id") * 2654435761 % 999999937).alias("url_hash"),
        F.col("id").alias("payload"),
    )
    seen = spark.range(2000, 9000).select(
        (F.col("id") * 2654435761 % 999999937).alias("url_hash")
    )
    want = table_fingerprint(cand.join(seen, "url_hash", "left_anti"), ["url_hash", "payload"])
    assert len(want) > 0

    # plain JVM path
    got = table_fingerprint(dedup_unseen(cand, seen, partitions=8), ["url_hash", "payload"])
    assert got == want

    # persisted-bloom path: exact same result (FPs re-checked, no FNs)
    root = tempfile.mkdtemp(prefix="httpz_bloom_")
    try:
        idx = BloomIndex.open_or_create(root, partitions=8, capacity_per_part=10_000)
        idx.update(seen)
        got_b = table_fingerprint(
            dedup_unseen(cand, seen, partitions=8, bloom=idx), ["url_hash", "payload"]
        )
        assert got_b == want
        # idempotent re-update (the resume path) changes nothing
        idx.update(seen)
        got_b2 = table_fingerprint(
            dedup_unseen(cand, seen, partitions=8, bloom=idx), ["url_hash", "payload"]
        )
        assert got_b2 == want
        # missing bloom file degrades to exact check, never to wrong results
        import os

        os.remove(os.path.join(root, "pid=0.npy"))
        got_deg = table_fingerprint(
            dedup_unseen(cand, seen, partitions=8, bloom=idx), ["url_hash", "payload"]
        )
        assert got_deg == want
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_urls_to_frontier_canonical(spark):
    df = spark.createDataFrame(
        [("HTTPS://H1.Test/a?b=2&a=1#f",), ("h2.test/x",), ("https://h1.test/a?a=1&b=2",)],
        "raw string",
    )
    fr = urls_to_frontier(df, "raw", depth=0, wave_id=0)
    rows = {r["url_canon"]: r for r in fr.collect()}
    assert "https://h1.test/a?a=1&b=2" in rows
    assert rows["https://h1.test/a?a=1&b=2"]["host"] == "h1.test"
    assert rows["https://h1.test/a?a=1&b=2"]["path"] == "/a"
    assert rows["https://h2.test/x"]["scheme"] == "https"


def test_crawl_waves_and_politeness(spark, world):
    state = tempfile.mkdtemp(prefix="httpz_crawl_")
    try:
        eng = make_engine(spark, world, state)
        eng.init_frontier(seed_df(spark, world))
        results = eng.crawl(max_waves=4)
        n = results.count()
        assert n > 0

        # seen-set: unique url_hash, every fetched URL present
        seen = eng.store.read("seen")
        assert seen.count() == seen.select("url_hash").distinct().count()
        assert results.select("url_hash").distinct().count() == n

        # politeness: per (wave, host) fetched count <= per-host budget
        budgets = {r["host"]: r["per_wave_budget"] for r in S.robots_df(spark, world).collect()}
        per = results.groupBy("wave_id", "host").agg(F.count("*").alias("n")).collect()
        for r in per:
            assert r["n"] <= budgets.get(r["host"], 4), (r["host"], r["n"])

        # robots disallow: no /r/ paths fetched for disallowing hosts
        disallowing = {h for h, b in budgets.items()
                       if FB.h64(f"{world.seed}:robots:{h}") % 5 == 0}
        bad = results.filter(
            F.col("host").isin(list(disallowing)) & F.col("path").startswith("/r/")
        ).count()
        assert bad == 0

        # lineage: one row per wave, counters consistent
        lineage = eng.store.read("lineage").orderBy("wave_id").collect()
        assert [r["wave_id"] for r in lineage] == list(range(len(lineage)))
        assert sum(r["n_fetched"] for r in lineage) == n

        # multi-wave: discovered links were crawled (depth > 0 rows exist)
        assert results.filter(F.col("depth") > 0).count() > 0
    finally:
        shutil.rmtree(state, ignore_errors=True)


def test_crawl_bloom_path_equals_plain(spark, world):
    """Forcing the bloom dedup path (bloom_min_seen=0) produces the exact
    same crawl as the default plain anti-join path."""
    base = tempfile.mkdtemp(prefix="httpz_bloomcrawl_")
    try:
        fps = []
        for sub, over in (("plain", {}), ("bloom", {"bloom_min_seen": 0})):
            eng = make_engine(spark, world, f"{base}/{sub}", **over)
            eng.init_frontier(seed_df(spark, world))
            eng.crawl(max_waves=3)
            fps.append(table_fingerprint(
                eng.store.read("results"), ["url_hash", "status", "wave_id"]))
        assert fps[0] == fps[1] and len(fps[0]) > 0
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_resume_after_kill_is_exact(spark, world):
    """north_rule: a killed job resumes exactly.  Three kill points:
    (a) between waves, (b) after staging but before merges, (c) fresh run."""
    base = tempfile.mkdtemp(prefix="httpz_resume_")
    try:
        # uninterrupted reference run
        full_dir = f"{base}/full"
        eng_full = make_engine(spark, world, full_dir)
        eng_full.init_frontier(seed_df(spark, world))
        eng_full.crawl(max_waves=4)
        want_results = table_fingerprint(
            eng_full.store.read("results"), ["url_hash", "status", "title", "wave_id"]
        )
        want_seen = table_fingerprint(eng_full.store.read("seen"), ["url_hash", "first_wave"])

        # (a) kill between waves: run wave 0 only, then resume with crawl()
        a_dir = f"{base}/a"
        eng_a = make_engine(spark, world, a_dir)
        eng_a.init_frontier(seed_df(spark, world))
        eng_a.run_wave(0)
        del eng_a  # "kill"
        eng_a2 = make_engine(spark, world, a_dir)
        eng_a2.crawl(max_waves=4)
        assert table_fingerprint(
            eng_a2.store.read("results"), ["url_hash", "status", "title", "wave_id"]
        ) == want_results
        assert table_fingerprint(eng_a2.store.read("seen"), ["url_hash", "first_wave"]) == want_seen

        # (b) kill mid-wave: staging written, merges not applied
        b_dir = f"{base}/b"
        eng_b = make_engine(spark, world, b_dir)
        eng_b.init_frontier(seed_df(spark, world))
        eng_b.run_wave(0)
        frontier = eng_b.store.read("frontier")
        scheduled, deferred = eng_b._schedule(frontier)
        eng_b.store.write("wave1_deferred", deferred.select(*frontier.columns))
        eng_b.store.write(
            "wave1_meta",
            spark.createDataFrame([(int(frontier.count()),)], "n_ready long"),
        )
        eng_b.store.write("wave1_out", eng_b._fetch(scheduled, 1))
        del eng_b  # "kill" before merges/lineage
        eng_b2 = make_engine(spark, world, b_dir)
        eng_b2.crawl(max_waves=4)
        assert table_fingerprint(
            eng_b2.store.read("results"), ["url_hash", "status", "title", "wave_id"]
        ) == want_results
        assert table_fingerprint(eng_b2.store.read("seen"), ["url_hash", "first_wave"]) == want_seen

        # re-calling crawl on a finished state is a no-op
        eng_a2.crawl(max_waves=4)
        assert table_fingerprint(
            eng_a2.store.read("results"), ["url_hash", "status", "title", "wave_id"]
        ) == want_results
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_cooperative_stop_and_resume_exact(spark, world):
    """Mid-wave stop() drains cleanly: (a) a stop between waves halts the
    loop, (b) a stop during the fetch UDF aborts staging pre-commit; both
    resume to tables byte-identical to an uninterrupted run."""
    base = tempfile.mkdtemp(prefix="httpz_stop_")
    try:
        full_dir = f"{base}/full"
        eng_full = make_engine(spark, world, full_dir)
        eng_full.init_frontier(seed_df(spark, world))
        eng_full.crawl(max_waves=4)
        want = table_fingerprint(
            eng_full.store.read("results"), ["url_hash", "status", "title", "wave_id"]
        )

        # (a) stop between waves
        a_dir = f"{base}/a"
        eng = make_engine(spark, world, a_dir)
        eng.init_frontier(seed_df(spark, world))
        eng.run_wave(0)
        eng.request_stop()
        eng.crawl(max_waves=4)  # no-op: drained
        assert eng.committed_waves() == {0}
        eng.clear_stop()
        eng.crawl(max_waves=4)
        got = table_fingerprint(
            eng.store.read("results"), ["url_hash", "status", "title", "wave_id"]
        )
        assert got == want

        # (b) stop lands while the fetch UDF is running: the staging job
        # aborts before commit and run_wave reports stopped
        b_dir = f"{base}/b"
        eng_b = make_engine(spark, world, b_dir)
        eng_b.init_frontier(seed_df(spark, world))
        eng_b.run_wave(0)
        frontier = eng_b.store.read("frontier")
        scheduled, _deferred = eng_b._schedule(frontier)
        eng_b.request_stop()
        with pytest.raises(Exception, match="cooperative stop"):
            eng_b._fetch(scheduled, 1).count()  # in-UDF sentinel trips
        stats = eng_b.run_wave(1)
        assert stats.get("stopped") is True
        assert not eng_b.store.exists("wave1_out")  # staging never committed
        eng_b.clear_stop()
        eng_b.crawl(max_waves=4)
        got_b = table_fingerprint(
            eng_b.store.read("results"), ["url_hash", "status", "title", "wave_id"]
        )
        assert got_b == want
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_partition_lineage_consistent_and_resume_exact(spark, world, tmp_path):
    """Per-partition fetch lineage (north rule: partition-granular
    metrics checkpoint): row counts reconcile with the wave-level
    lineage, and a kill + resume re-derives the identical table."""
    state = str(tmp_path / "pl_state")
    eng = make_engine(spark, world, state)
    eng.init_frontier(seed_df(spark, world))
    eng.crawl(max_waves=2)

    pl = eng.store.read("partition_lineage")
    lineage = {r["wave_id"]: r for r in eng.store.read("lineage").collect()}
    rows = pl.collect()
    assert rows
    by_wave = {}
    for r in rows:
        by_wave.setdefault(r["wave_id"], 0)
        by_wave[r["wave_id"]] += r["n_rows"]
        assert 0 <= r["n_errors"] <= r["n_rows"]
        assert r["latency_ms_max"] is not None
    for w, n in by_wave.items():
        assert n == lineage[w]["n_fetched"], (w, n)
    want = table_fingerprint(pl, ["wp_key", "n_rows", "n_errors",
                                  "latency_ms_sum", "latency_ms_max"])

    # fresh engine over the same state: committed waves are skipped and
    # the table is untouched; a re-crawl from scratch in a NEW state dir
    # derives the identical fingerprint (partitioning is deterministic)
    eng2 = make_engine(spark, world, state)
    eng2.crawl(max_waves=2)
    assert table_fingerprint(
        eng2.store.read("partition_lineage"),
        ["wp_key", "n_rows", "n_errors", "latency_ms_sum",
         "latency_ms_max"]) == want

    state_b = str(tmp_path / "pl_state_b")
    eng3 = make_engine(spark, world, state_b)
    eng3.init_frontier(seed_df(spark, world))
    eng3.crawl(max_waves=2)
    assert table_fingerprint(
        eng3.store.read("partition_lineage"),
        ["wp_key", "n_rows", "n_errors", "latency_ms_sum",
         "latency_ms_max"]) == want


def test_resume_from_pre_partition_lineage_staging(spark, world, tmp_path):
    """Cross-version resume: staging written by a build WITHOUT the
    fetch_part column (pre-partition-lineage layout) must still merge —
    degrade to wave lineage only, never wedge the resume."""
    state = str(tmp_path / "old_staging")
    eng = make_engine(spark, world, state)
    eng.init_frontier(seed_df(spark, world))

    # stage wave 0 the way run_wave does, but with the old output layout
    frontier = eng.store.read("frontier")
    n_ready = frontier.count()
    scheduled, deferred = eng._schedule(frontier)
    from httpz_spark.plans.frontier import FRONTIER_COLS
    eng.store.write("wave0_deferred", deferred.select(*FRONTIER_COLS))
    eng.store.write("wave0_meta", spark.createDataFrame(
        [(int(n_ready),)], "n_ready long"))
    eng.store.write("wave0_out", eng._fetch(scheduled, 0).drop("fetch_part"))

    summary = eng.run_wave(0)  # resume path: staging exists, no re-fetch
    assert summary["n_fetched"] > 0
    assert eng.store.read("results").count() == summary["n_fetched"]
    assert eng.store.read("partition_lineage") is None  # degraded, not wedged

    # the NEXT wave (fresh staging, new layout) records partition lineage
    eng.run_wave(1)
    pl = eng.store.read("partition_lineage")
    assert pl is not None and all(r["wave_id"] == 1 for r in pl.collect())
