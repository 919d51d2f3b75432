"""Golden parity harness: Spark engine vs the reference behavioral model.

Both sides fetch the SAME deterministic fabric; the reference side
(parity.refscan) re-enacts scanner.py's control flow; the engine side is
the wave/column implementation.  Compared: URL-seen set, crawl order under
the pinned scheduler, and per-row field equality — SURVEY.md §5.2 item 2.
"""

import math

import pytest
from pyspark.sql import functions as F

from httpz_spark.config import ScanConfig
from httpz_spark.parity import refscan
from httpz_spark.plans.scan import scan_plan
from httpz_spark.sources import fabric as FB
from httpz_spark.sources import synthetic as S


@pytest.fixture(scope="module")
def world():
    cfg = FB.FabricConfig(n_images=96, n_hosts=24).with_certs()
    return cfg


@pytest.fixture(scope="module")
def seeds(world):
    return S.seed_domain_lines(world)


def run_both(spark, world, seeds, scan_cfg, order_by_completion=True):
    transport = FB.FabricTransport(world)
    golden = refscan.scan(
        seeds, transport, scan_cfg,
        dns_map={h.lower(): FB.dns_for_host(h, world) for h in FB.all_hosts(world)},
        cname_targets=FB.cname_map(world),
    )
    sdf = S.seeds_df(spark, seeds)
    images = S.images_df(spark, world, partitions=4)
    dns = S.dns_df(spark, world)
    result = scan_plan(spark, sdf, images, dns, scan_cfg, world)
    rows = [r.asDict(recursive=True) for r in result.collect()]
    if order_by_completion and scan_cfg.match_codes is None and scan_cfg.exclude_codes is None:
        # pinned crawl order: the simulated FIRST_COMPLETED pump over the
        # deterministic latencies, admission in seed (line) order — the
        # same simulation refscan emits in
        rows.sort(key=lambda r: r["line_num"])
        order = refscan.completion_order(
            [r["latency_ms"] or 0.0 for r in rows], scan_cfg.concurrent_limit
        )
        rows = [rows[i] for i in order]
    else:
        golden = sorted(golden, key=lambda g: g["domain"])
        rows = sorted(rows, key=lambda r: r["domain"])
    return golden, rows


FIELDS = [
    "domain", "url", "status", "protocol", "content_type", "redirect_chain",
    "title", "body_preview", "body_clean", "favicon_hash", "ips",
    "cname_chain", "error", "error_type",
]


def engine_row_as_refdict(r: dict) -> dict:
    """Engine columns -> reference dict shape (nulls = absent fields;
    content_length int/str union re-joined)."""
    out = {}
    for f in FIELDS:
        v = r.get(f)
        if v is not None:
            out[f] = v
    if r.get("content_length") is not None:
        out["content_length"] = r["content_length"]
    elif r.get("content_length_raw") is not None:
        out["content_length"] = r["content_length_raw"]
    if r.get("response_headers") is not None:
        out["response_headers"] = dict(r["response_headers"])
    if r.get("tls") is not None:
        out["tls"] = {k: v for k, v in r["tls"].items()}
    return out


def golden_row_comparable(g: dict) -> dict:
    g = dict(g)
    g.pop("_latency_ms", None)
    return g


def test_full_parity_all_toggles(spark, world, seeds):
    # small concurrent_limit so the queue-dynamics of the completion-order
    # simulation actually matter (tasks admitted as slots free up)
    cfg = ScanConfig.all_on(retries=1, concurrent_limit=4)
    golden, rows = run_both(spark, world, seeds, cfg)

    assert len(golden) == len(rows), "row counts differ"

    # (a) URL-seen set: the set of scanned domains must match exactly
    assert {g["domain"] for g in golden} == {r["domain"] for r in rows}

    # (b) crawl order: the simulated FIRST_COMPLETED completion order over
    # identical latencies must match exactly on both sides
    assert [g["domain"] for g in golden] == [r["domain"] for r in rows]

    # (c) per-row field equality
    for g, r in zip(golden, rows):
        got = engine_row_as_refdict(r)
        want = golden_row_comparable(g)
        assert got == want, f"\ndomain={g['domain']}\nwant={want}\ngot ={got}"


def test_parity_match_codes(spark, world, seeds):
    # match_codes drops error rows (status=-1) silently — scanner.py:450-451
    cfg = ScanConfig.all_on(match_codes=frozenset({200}))
    golden, rows = run_both(spark, world, seeds, cfg)
    assert all(g["status"] == 200 for g in golden)
    assert [g["domain"] for g in golden] == [r["domain"] for r in rows]


def test_parity_exclude_codes(spark, world, seeds):
    cfg = ScanConfig.all_on(exclude_codes=frozenset({404, 500}))
    golden, rows = run_both(spark, world, seeds, cfg)
    assert [g["domain"] for g in golden] == [r["domain"] for r in rows]
    assert all(r["status"] not in (404, 500) for r in rows)


def test_parity_shard_split(spark, world, seeds):
    # --shard i/N behavior (utils.py:182-183) must reproduce exactly
    for total in (2, 3):
        union_domains = []
        for idx in range(total):
            cfg = ScanConfig.all_on(shard=(idx, total))
            golden, rows = run_both(spark, world, seeds, cfg)
            assert [g["domain"] for g in golden] == [r["domain"] for r in rows], (idx, total)
            union_domains += [r["domain"] for r in rows]
        full = refscan.scan(
            seeds, FB.FabricTransport(world), ScanConfig.all_on(),
            dns_map={h.lower(): FB.dns_for_host(h, world) for h in FB.all_hosts(world)},
            cname_targets=FB.cname_map(world),
        )
        assert sorted(union_domains) == sorted(g["domain"] for g in full)


def test_parity_minimal_toggles(spark, world, seeds):
    # default reference config: all fetch_* off -> only core fields present
    cfg = ScanConfig()
    golden, rows = run_both(spark, world, seeds, cfg)
    for g, r in zip(golden, rows):
        assert engine_row_as_refdict(r) == golden_row_comparable(g)
        assert r["title"] is None and r["ips"] is None


def test_payload_invariants(spark, world, seeds):
    """input_hint per-row invariant: decoded-pixel allclose (PSNR>=40dB for
    lossy) + caption equality between the engine's payload columns and the
    fabric's ground truth."""
    import numpy as np

    from httpz_spark.codecs.images import decode_image, psnr

    cfg = ScanConfig.all_on()
    sdf = S.seeds_df(spark, seeds)
    images = S.images_df(spark, world, partitions=4)
    dns = S.dns_df(spark, world)
    result = scan_plan(spark, sdf, images, dns, cfg, world, include_payload=True)
    rows = result.filter(F.col("image_id").isNotNull()).collect()
    assert rows
    for r in rows[:24]:
        truth = FB.image_record(r["image_id"], world)
        assert r["caption"] == truth["caption"]
        got_px = decode_image(bytes(r["bytes"]), r["fmt"])
        ref_px = FB.image_pixels(r["image_id"], world)
        if r["fmt"] == "png":
            assert np.array_equal(got_px, ref_px)
        else:
            p = psnr(got_px, ref_px)
            assert p >= 40.0 or math.isinf(p), p
        assert r["phash"] == truth["phash"]
