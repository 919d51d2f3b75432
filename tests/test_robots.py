"""robots.txt builder: native parser semantics + end-to-end fetch over the
fabric, cross-checked against the synthetic robots table (the fabric's
/robots.txt bodies are generated to DECODE to exactly ``robots_df``'s
rows, through deliberately varied formatting)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from httpz_spark.functions.robotsx import robots_columns
from httpz_spark.operators.robotsfetch import (
    build_robots_table,
    fetch_robots,
    robots_from_texts,
)
from httpz_spark.sources import fabric as FB
from httpz_spark.sources import synthetic as S

WORLD = FB.FabricConfig(n_images=256, n_hosts=48).with_certs()


def _parse(spark, txt, default_ms=1000):
    row = spark.createDataFrame([(txt,)], "robots_txt string").select(
        robots_columns(F.col("robots_txt"), default_ms).alias("p")
    ).collect()[0]["p"]
    return row["crawl_delay_ms"], list(row["disallow"])


def test_parser_basic_group(spark):
    txt = "User-agent: *\nCrawl-delay: 0.25\nDisallow: /a/\nDisallow: /b\n"
    assert _parse(spark, txt) == (250, ["/a/", "/b"])


def test_parser_selects_star_record_only(spark):
    txt = ("User-agent: GoogleBot\nDisallow: /g/\n\n"
           "User-agent: *\nDisallow: /x/\n\n"
           "User-agent: OtherBot\nDisallow: /o/\n")
    assert _parse(spark, txt) == (1000, ["/x/"])


def test_parser_adjacent_user_agents_share_record(spark):
    txt = "User-agent: a\nUser-agent: *\nUser-agent: b\nDisallow: /shared/\n"
    assert _parse(spark, txt) == (1000, ["/shared/"])


def test_parser_comments_crlf_case_empty_disallow(spark):
    txt = ("# header comment\r\n"
           "USER-AGENT: *  # trailing\r\n"
           "CRAWL-DELAY: 2  # two seconds\r\n"
           "DISALLOW: /UP/\r\n"
           "Disallow:\r\n")  # empty value = allow-all, contributes nothing
    assert _parse(spark, txt) == (2000, ["/UP/"])


def test_parser_no_star_record_and_null(spark):
    assert _parse(spark, "User-agent: onlybot\nDisallow: /x/\n") == (1000, [])
    assert _parse(spark, "") == (1000, [])


def test_parser_record_terminates_at_next_agent(spark):
    txt = ("User-agent: *\nDisallow: /mine/\n\n"
           "User-agent: bot\nCrawl-delay: 9\nDisallow: /theirs/\n")
    assert _parse(spark, txt) == (1000, ["/mine/"])


def test_robots_from_texts_budget_and_defaults(spark):
    fetched = spark.createDataFrame(
        [("h1", 200, "User-agent: *\nCrawl-delay: 0.05\nDisallow: /r/\n", None),
         ("h2", 404, None, None),
         ("h3", -1, None, "CONN")],
        "host string, fetch_status int, robots_txt string, error_type string",
    )
    out = {r["host"]: r for r in robots_from_texts(
        fetched, default_delay_ms=500, wave_window_ms=10_000, max_budget=50
    ).collect()}
    assert out["h1"]["crawl_delay_ms"] == 50
    assert list(out["h1"]["disallow"]) == ["/r/"]
    assert out["h1"]["per_wave_budget"] == 50  # 10000/50=200, clamped to 50
    for h in ("h2", "h3"):  # allow-all defaults, status preserved
        assert out[h]["crawl_delay_ms"] == 500
        assert list(out[h]["disallow"]) == []
        assert out[h]["per_wave_budget"] == 20  # 10000/500
    assert out["h3"]["fetch_status"] == -1


def test_build_robots_table_matches_synthetic(spark):
    """End-to-end over the fabric: every host whose robots fetch succeeded
    must decode to EXACTLY its robots_df row (crawl_delay_ms + disallow —
    the budget is the builder's own documented derivation); failed hosts
    (the fabric's injected TIMEOUT/CONN/... classes on /robots.txt) get
    the allow-all default."""
    hosts = spark.createDataFrame(
        [(h,) for h in FB.all_hosts(WORLD)], "host string"
    )
    got = {r["host"]: r for r in build_robots_table(
        hosts, WORLD, partitions=4
    ).collect()}
    want = {r["host"]: r for r in S.robots_df(spark, WORLD).collect()}
    assert set(got) == set(want)
    n_ok = 0
    for h, w in want.items():
        g = got[h]
        if g["fetch_status"] == 200:
            n_ok += 1
            assert g["crawl_delay_ms"] == w["crawl_delay_ms"], h
            assert list(g["disallow"]) == list(w["disallow"]), h
        else:
            assert list(g["disallow"]) == [] and g["crawl_delay_ms"] == 1000, h
    # the fabric's failure classes hit ~10% of URLs; most hosts must parse
    assert n_ok >= len(want) * 0.7, n_ok


def test_fetch_stage_contains_failures_per_row(spark):
    """A host that fails on BOTH protocols yields a default row, never a
    task failure."""
    hosts = spark.createDataFrame(
        [(h,) for h in FB.all_hosts(WORLD)[:16]], "host string"
    )
    fetched = fetch_robots(hosts, WORLD, partitions=2).collect()
    assert len(fetched) == 16
    for r in fetched:
        if r["fetch_status"] == -1:
            assert r["error_type"] is not None
            assert r["robots_txt"] is None


def test_parse_projection_is_native(spark):
    """The parse side must plan zero Python stages (the fetch stage is the
    only sanctioned mapInPandas)."""
    import contextlib
    import io

    fetched = spark.createDataFrame(
        [("h", 200, "User-agent: *\nDisallow: /x/\n", None)],
        "host string, fetch_status int, robots_txt string, error_type string",
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        robots_from_texts(fetched).explain("formatted")
    p = buf.getvalue()
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p
