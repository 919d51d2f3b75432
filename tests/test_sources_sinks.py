"""Seed sources, sinks, UA rotation, custom headers/POST parity."""

import json
import os
import shutil
import tempfile

from pyspark.sql import functions as F

from httpz_spark.config import ScanConfig
from httpz_spark.functions.ua import USER_AGENTS, ua_for
from httpz_spark.parity import refscan
from httpz_spark.plans.scan import scan_plan
from httpz_spark.sources import fabric as FB
from httpz_spark.sources import synthetic as S
from httpz_spark.sources.seeds import seeds_from_lines, seeds_from_string, seeds_from_text
from httpz_spark.sources.sinks import console_line, to_jsonl_column, write_jsonl


def test_seed_sources(spark):
    lines = ["a.com", "", "b.com", "  c.com  "]
    for df in (
        seeds_from_lines(spark, lines),
        seeds_from_string(spark, "\n".join(lines)),
        seeds_from_string(spark, "\n".join(lines).encode()),
    ):
        rows = df.orderBy("line_num").collect()
        assert [r["raw"] for r in rows] == lines
        assert [r["line_num"] for r in rows] == [0, 1, 2, 3]

    d = tempfile.mkdtemp()
    try:
        p = os.path.join(d, "seeds.txt")
        with open(p, "w") as f:
            f.write("\n".join(lines))
        rows = seeds_from_text(spark, p).orderBy("line_num").collect()
        assert [r["raw"] for r in rows] == lines
    finally:
        shutil.rmtree(d)


def test_ua_pool():
    assert len(USER_AGENTS) == 44 and len(set(USER_AGENTS)) == 44
    # deterministic, attempt-sensitive
    assert ua_for("https://x.test", 0) == ua_for("https://x.test", 0)
    picks = {ua_for(f"https://h{i}.test", 0) for i in range(200)}
    assert len(picks) > 20  # rotation actually spreads


def run_pair(spark, world, seeds, cfg):
    transport = FB.FabricTransport(world)
    golden = refscan.scan(
        seeds, transport, cfg,
        dns_map={h.lower(): FB.dns_for_host(h, world) for h in FB.all_hosts(world)},
        cname_targets=FB.cname_map(world),
    )
    res = scan_plan(
        spark, seeds_from_lines(spark, seeds), S.images_df(spark, world, 2),
        S.dns_df(spark, world), cfg, world, include_payload=False,
    )
    rows = [r.asDict(recursive=True) for r in res.collect()]
    golden = sorted(golden, key=lambda g: g["domain"])
    rows = sorted(rows, key=lambda r: r["domain"])
    return golden, rows


def test_ua_and_custom_headers_parity(spark):
    """UA rotation + custom headers + POST observable via the fabric's echo
    headers, identical on both parity sides."""
    world = FB.FabricConfig(n_images=24, n_hosts=8).with_certs()
    seeds = S.seed_domain_lines(world)
    cfg = ScanConfig.all_on(
        custom_headers=(("X-Crawl-Run", "r1"),), post_data="payload=1"
    )
    golden, rows = run_pair(spark, world, seeds, cfg)
    assert [g["domain"] for g in golden] == [r["domain"] for r in rows]
    checked = 0
    for g, r in zip(golden, rows):
        gh = g.get("response_headers")
        rh = r.get("response_headers")
        if gh is None:
            assert rh is None or r["status"] == -1
            continue
        assert rh["X-Echo-Method"] == "POST" == gh["X-Echo-Method"]
        assert rh["X-Echo-H-X-Crawl-Run"] == "r1"
        assert rh["X-Echo-UA"] == gh["X-Echo-UA"]
        assert rh["X-Echo-UA"] in USER_AGENTS
        checked += 1
    assert checked > 5


def test_jsonl_sink_drops_nulls(spark):
    world = FB.FabricConfig(n_images=24, n_hosts=8).with_certs()
    res = scan_plan(
        spark, seeds_from_lines(spark, S.seed_domain_lines(world)),
        S.images_df(spark, world, 2), S.dns_df(spark, world),
        ScanConfig.all_on(), world, include_payload=False,
    )
    lines = res.select(to_jsonl_column(res).alias("j")).collect()
    ok_seen = err_seen = False
    for ln in lines:
        d = json.loads(ln["j"])
        assert None not in d.values()  # dict-shape: absent, not null
        if d["status"] >= 0:
            ok_seen = True
            assert "error" not in d
        else:
            err_seen = True
            assert "error_type" in d and "url" not in d
    assert ok_seen and err_seen

    out = tempfile.mkdtemp()
    try:
        write_jsonl(res, out)
        back = spark.read.json(out)
        assert back.count() == res.count()
    finally:
        shutil.rmtree(out)

    shown = res.select(console_line(res).alias("line")).collect()
    assert all(r["line"] for r in shown)
