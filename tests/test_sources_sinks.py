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
    # guarantee at least one final-error row regardless of the world's hash
    # distribution: find a host whose root CONN-fails on both protocols
    bad_host = next(
        f"h{i}.test" for i in range(5000)
        if FB.url_class(f"h{i}.test", "/", world)["fail_http"] == "CONN"
    )
    res = scan_plan(
        spark, seeds_from_lines(spark, S.seed_domain_lines(world) + [bad_host]),
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


def test_stdin_seed_source_shard_parity(spark):
    """Piped input ('-'): blank lines keep consuming line numbers, so shard
    selection over stdin matches the reference model (utils.py:186-196)."""
    import io

    from pyspark.sql import functions as F

    from httpz_spark.functions.text import nonblank, shard_keep
    from httpz_spark.parity.refmodel import input_lines
    from httpz_spark.sources.seeds import seeds, seeds_from_stdin

    raw = "a.test\n\nb.test\r\nc.test\n\n\nd.test\ne.test\n"
    lines = raw.splitlines()

    df = seeds_from_stdin(spark, io.StringIO(raw))
    assert df.count() == len(lines)  # blanks numbered

    for shard in [(0, 3), (1, 3), (2, 3)]:
        got = [
            r["raw"].strip()
            for r in df.filter(
                shard_keep(F.col("line_num"), shard[0], shard[1])
                & nonblank(F.col("raw"))
            ).orderBy("line_num").collect()
        ]
        want = input_lines(lines, shard=shard)
        assert got == want, (shard, got, want)


def test_seeds_dispatch(spark, tmp_path):
    import io
    import sys

    from httpz_spark.sources.seeds import seeds

    p = tmp_path / "seeds.txt"
    p.write_text("x.test\ny.test\n")
    assert seeds(spark, str(p)).count() == 2          # file path
    assert seeds(spark, ["a", "b", "c"]).count() == 3  # iterable
    assert seeds(spark, "a\nb").count() == 2           # raw string
    old = sys.stdin
    sys.stdin = io.StringIO("p.test\nq.test\n")        # '-' -> stdin
    try:
        assert seeds(spark, "-").count() == 2
    finally:
        sys.stdin = old


def test_seeds_async_iterable(spark):
    from httpz_spark.sources.seeds import seeds

    async def agen():
        yield "a.test"
        yield b"b.test"
        yield ""
        yield "c.test"

    rows = seeds(spark, agen()).orderBy("line_num").collect()
    assert [r["raw"] for r in rows] == ["a.test", "b.test", "", "c.test"]


def test_console_line_colored(spark):
    from httpz_spark.sources.sinks import Ansi, console_line_colored

    df = spark.createDataFrame(
        [
            (200, "https://a.test/", "a.test", "t1", "text/html", 2048,
             None, None, "CONN refused"),
            (301, "https://b.test/", "b.test", None, None, None, None, None, None),
            (404, None, "c.test", None, None, None, None, None, None),
            (-1, None, "d.test", None, None, None, "CONN", "Connection Failed: x", None),
        ],
        "status int, url string, domain string, title string, content_type string, "
        "content_length long, error_type string, error string, junk string",
    )
    show = {"status_code": True, "title": True, "content_type": True,
            "content_length": True}
    lines = [r["l"] for r in df.select(
        console_line_colored(df, show_fields=show).alias("l")).collect()]
    assert Ansi.GREEN + "[200]" in lines[0]
    assert "[https://a.test/]" in lines[0]
    assert Ansi.DARK_GREEN + "[t1]" in lines[0]      # title segment
    assert Ansi.CYAN + "[text/html]" in lines[0]
    assert Ansi.PINK + "[2.0KB]" in lines[0]         # human_size
    assert Ansi.YELLOW + "[301]" in lines[1]
    assert Ansi.RED + "[404]" in lines[2]
    assert "[c.test]" in lines[2]                    # domain fallback
    assert lines[3] == ""                            # error row skipped sans debug

    dbg = [r["l"] for r in df.select(
        console_line_colored(df, show_fields=show, debug=True).alias("l")).collect()]
    assert Ansi.RED + "[-1]" in dbg[3]
    assert "CONN: Connection Failed: x" in dbg[3]

    matched = [r["l"] for r in df.select(
        console_line_colored(df, show_fields=show, match_codes={200}).alias("l")
    ).collect()]
    assert matched[0] != "" and matched[1] == "" and matched[2] == ""
