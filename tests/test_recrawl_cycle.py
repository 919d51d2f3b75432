"""Steady-state recrawl loop: sitemap seeds -> recrawl classification ->
conditional revalidation wave -> seen-meta MERGE -> next cycle.

The composition the round-6 operators exist for: at north_rule steady
state the frontier is re-seeded from sitemaps on a cadence, almost
everything is already seen and unchanged, and each cycle's real work is
(a) the tiny new/stale classification join (operators/recrawl.py) and
(b) 304-answered conditional fetches for the stale slice
(operators/revalidate.py), with refreshed validators MERGEd back into a
StateStore table (plans/statestore.py) so the next cycle sees them.
"""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from httpz_spark.config import ScanConfig
from httpz_spark.operators.recrawl import recrawl_candidates
from httpz_spark.operators.revalidate import revalidate_plan
from httpz_spark.operators.sitemapfetch import sitemap_seed_frame
from httpz_spark.plans.statestore import StateStore
from httpz_spark.sources import fabric as FB


@pytest.fixture(scope="module")
def world():
    return FB.FabricConfig(n_images=64, n_hosts=12).with_certs()


def _seeds(spark, world):
    hosts = spark.createDataFrame(
        [(h,) for h in FB.all_hosts(world)], "host string")
    return sitemap_seed_frame(hosts, world, partitions=4)


def _to_candidates(rows, seen_meta):
    # (host, path, etag, last_modified) for the wave: loc -> host+path,
    # joined with any stored HTTP validators
    c = rows.select(
        "host", "loc",
        F.regexp_replace("loc", r"^[a-z]+://[^/]*", "").alias("path"),
    )
    if seen_meta is None:
        return c.select("host", "loc", "path",
                        F.lit(None).cast("string").alias("etag"),
                        F.lit(None).cast("string").alias("last_modified"))
    sm = seen_meta.select(F.col("url").alias("loc"), "etag",
                          F.col("http_last_modified").alias("last_modified"))
    return c.join(sm, "loc", "left")


def test_recrawl_cycle_steady_state(spark, world):
    state = tempfile.mkdtemp(prefix="httpz_cycle_")
    try:
        store = StateStore(spark, state)
        cfg = ScanConfig(fetch_headers=True, retries=1)
        seeds = _seeds(spark, world).localCheckpoint()
        n_seeds = seeds.count()
        assert n_seeds > 20

        # ---- cycle 1: cold start — everything is new, fetched in full
        cand1 = recrawl_candidates(seeds, None)
        assert cand1.filter(F.col("recrawl_reason") != "new").count() == 0
        wave1 = revalidate_plan(
            _to_candidates(cand1, None), cfg, world).localCheckpoint()
        assert wave1.filter(F.col("not_modified")).count() == 0
        # MERGE: store the sitemap lastmod we acted on + HTTP validators
        meta1 = wave1.filter(F.col("status") >= 0).select(
            F.concat(F.lit("https://"), F.col("host"), F.col("path")).alias("url"),
            F.col("etag_new").alias("etag"),
            F.col("last_modified_new").alias("http_last_modified"),
        ).join(seeds.select(F.col("loc").alias("url"), "lastmod"), "url", "left")
        store.merge_upsert("seen_meta", meta1, key="url")
        n_meta = store.read("seen_meta").count()
        assert n_meta == wave1.filter(F.col("status") >= 0).count()

        # ---- cycle 2: unchanged world — recrawl drops everything fresh
        meta = store.read("seen_meta").select(
            "url", "etag", "http_last_modified",
            F.col("lastmod").alias("lastmod"))
        cand2 = recrawl_candidates(
            seeds, meta.select("url", F.col("lastmod").alias("lastmod")))
        # only locs that failed fetch in cycle 1 (never stored) come back
        n_c2 = cand2.count()
        assert n_c2 == n_seeds - seeds.join(
            meta.select(F.col("url").alias("loc")), "loc", "semi").count()

        # ---- cycle 3: simulate a sitemap advancing lastmod on stored rows
        # with UNCHANGED content: recrawl flags them stale, the conditional
        # wave answers 304 for every reachable one — the steady-state saving
        bumped = seeds.join(
            meta.select(F.col("url").alias("loc"), "etag",
                        "http_last_modified"),
            "loc", "inner",
        ).filter(F.col("lastmod").isNotNull()).localCheckpoint()
        n_bumped = bumped.count()
        assert n_bumped > 0
        older = bumped.select(
            F.col("loc").alias("url"), F.lit("2000-01-01").alias("lastmod"))
        cand3 = recrawl_candidates(seeds, older)
        stale3 = cand3.filter(F.col("recrawl_reason") == "stale")
        assert stale3.join(bumped.select("loc"), "loc", "semi").count() \
            == stale3.count()
        wave3 = revalidate_plan(
            _to_candidates(stale3, meta), cfg, world).localCheckpoint()
        ok3 = wave3.filter(F.col("status") >= 200)
        # every stale row with stored validators and a 2xx/3xx answer came
        # back 304 — content did not change, only the sitemap claim did
        reach = ok3.filter(F.col("etag").isNotNull())
        n_reach = reach.count()
        assert n_reach > 0
        assert reach.filter(~F.col("not_modified")).count() == 0
    finally:
        shutil.rmtree(state, ignore_errors=True)
