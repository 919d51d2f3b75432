"""Distributed builders for the synthetic world's Spark tables.

The payload table follows ``BASELINE.json:input_hint`` exactly:
``images(image_id string, bytes binary, w int, h int, fmt string,
caption string, phash bigint)``.

Generation is embarrassingly parallel and **order-independent**: every cell
is a pure function of ``image_id`` (via the fabric's blake2b RNG), so the same table comes
out regardless of partitioning — the property that lets a 10^10-row frontier
be synthesized as hash ranges on a cluster without any coordination.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from httpz_spark.sources import fabric as FB

IMAGES_SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, "
    "caption string, phash long"
)


def images_df(spark: SparkSession, cfg: FB.FabricConfig, partitions: int = 8) -> DataFrame:
    """The Iceberg-shaped payload table, generated distributed."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = [FB.image_record(FB.image_id_at(int(i)), cfg) for i in pdf["id"]]
            yield pd.DataFrame.from_records(recs)

    return (
        spark.range(0, cfg.n_images, 1, partitions)
        .mapInPandas(gen, schema=IMAGES_SCHEMA)
    )


VIDEOS_SCHEMA = (
    "media_id string, bytes binary, w int, h int, fps int, "
    "n_frames int, fmt string"
)


def videos_df(
    spark: SparkSession, cfg: FB.FabricConfig, n_videos: int = 24,
    partitions: int = 8,
) -> DataFrame:
    """Video payload table (SPKV containers), generated distributed."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = [FB.video_record(FB.video_id_at(int(i)), cfg) for i in pdf["id"]]
            yield pd.DataFrame.from_records(recs)

    return (
        spark.range(0, n_videos, 1, partitions)
        .mapInPandas(gen, schema=VIDEOS_SCHEMA)
    )


DNS_SCHEMA = "host string, a_records array<string>, aaaa_records array<string>, cname_target string"


def dns_df(spark: SparkSession, cfg: FB.FabricConfig) -> DataFrame:
    """DNS fixture table (FIXTURES.md §4): A/AAAA with dups + unsorted order,
    CNAME chains incl. multi-hop.  Small (one row per host) -> broadcast."""
    rows = []
    for host in FB.all_hosts(cfg):
        d = FB.dns_for_host(host, cfg)
        rows.append((host, d["a"], d["aaaa"], d["cname"]))
    return spark.createDataFrame(rows, DNS_SCHEMA)


ROBOTS_SCHEMA = (
    "host string, crawl_delay_ms int, per_wave_budget int, "
    "disallow array<string>, allow array<string>"
)


def robots_df(spark: SparkSession, cfg: FB.FabricConfig, unlimited: bool = False) -> DataFrame:
    """Synthetic robots/politeness table (north_rule requirement; the
    reference has no robots handling, so the parity harness passes
    ``unlimited=True``).  Mirrors ``fabric.robots_txt_bytes`` exactly,
    including the RFC 9309 wildcard/Allow fixtures (which are no-ops
    against fabric paths — see that docstring)."""
    rows = []
    for host in FB.all_hosts(cfg):
        hh = FB.h64(f"{cfg.seed}:robots:{host}")
        budget = 10**9 if unlimited else 2 + hh % 8
        disallow = [] if unlimited or hh % 5 else ["/r/"]
        allow = [] if unlimited or hh % 5 else ["/r/public/"]
        if not unlimited and hh % 3 == 0:
            disallow = disallow + ["/*.php$"]
        if not unlimited and hh % 7 == 3:
            allow = allow + ["/li/"]
        rows.append((host, 50 + hh % 200, budget, disallow, allow))
    return spark.createDataFrame(rows, ROBOTS_SCHEMA)


def seed_domain_lines(cfg: FB.FabricConfig, n_hosts: int | None = None) -> list:
    """Messy seed *domain* lines for the reference-parity layer (the
    reference scans bare domains; ``parsers.py:38-74`` drops paths).
    Includes blanks (which consume shard line numbers), whitespace, scheme
    prefixes, mixed case, trailing slashes, and weird ports — the verified
    edge cases from SURVEY.md §2."""
    n_hosts = n_hosts or cfg.n_hosts
    lines = []
    for i in range(n_hosts):
        host = f"h{i}.test"
        m = FB.h64(f"{cfg.seed}:seedline:{host}") % 8
        if m == 0:
            lines.append(f"  {host}  ")
        elif m == 1:
            lines.append(f"https://{host}/")
        elif m == 2:
            lines.append(f"http://{host}")
        elif m == 3:
            lines.append(host.upper())         # no case folding in reference
        elif m == 4:
            lines.append(f"{host}:8443")
        elif m == 5:
            lines.append(f"{host}///")
        else:
            lines.append(host)
        if m in (2, 5):
            lines.append("")                   # blanks consume line numbers
    return lines


def seed_url_lines(cfg: FB.FabricConfig, per_host: int = 4) -> list:
    """Seed *URLs* for the frontier/crawl layer: explicit page URLs in
    messy form (case, fragments, unsorted query params) so canonicalization
    and dedup have work to do."""
    lines = []
    for i in range(cfg.n_images):
        if FB.h64(f"{cfg.seed}:seedpick:{i}") % max(1, cfg.n_images // (cfg.n_hosts * per_host)):
            continue
        iid = FB.image_id_at(i)
        host = FB.host_for_image(iid, cfg)
        m = FB.h64(f"{cfg.seed}:seedform:{iid}") % 4
        if m == 0:
            lines.append(f"https://{host}/{iid}")
        elif m == 1:
            lines.append(f"HTTPS://{host.upper()}/{iid}#frag")
        elif m == 2:
            lines.append(f"http://{host}/{iid}")
        else:
            lines.append(f"{host}/{iid}")
    return lines


def seeds_df(spark: SparkSession, lines: list) -> DataFrame:
    """Seed table with explicit, persisted 0-based line numbers — the only
    shard-stable line identity at scale (monotonically_increasing_id is NOT
    stable; SURVEY.md §2 A2)."""
    return spark.createDataFrame(
        list(enumerate(lines)), "line_num long, raw string"
    )
