"""Live DNS adapters — producing the dns TABLE the join operators consume.

The engine resolves DNS declaratively: :mod:`dnsresolve`'s broadcast joins
run against a ``(host, a_records, aaaa_records, cname_target)`` table.  In
the sandbox that table is the fabric fixture; in production THIS module
builds/refreshes it from live resolvers, mirroring the reference's
dnspython behavior (``/root/reference/httpz_scanner/utils.py:107-169``:
A+AAAA gathered per host -> ``sorted(set(ips))``, CNAME one hop per query,
custom nameservers + per-query timeout from ``cli.py:127-134``):

* :class:`DnspythonResolver` — import-gated (dnspython is absent in this
  container): ``resolver.nameservers = custom``, ``lifetime = timeout``,
  A/AAAA/CNAME queries per host.
* :class:`StdlibResolver` — dependency-free fallback on
  ``socket.getaddrinfo`` (A + AAAA; the OS resolver path has no CNAME or
  custom-server hooks — documented degradation).
* any injected ``host -> {"a": [...], "aaaa": [...], "cname": str|None}``
  callable (how the semantics are tested).

Scale shape: resolution is a ``mapInPandas`` stage over DISTINCT hosts
(dedup before I/O), each partition overlapping its blocking lookups on a
thread pool (``concurrency`` in flight per task — the sync analogue of the
reference's asyncio gather).  CNAME targets discovered in round k become
round k+1's input (bounded by ``max_chain - 1`` rounds, scanner.py:50), so
building the chain costs at most 2 extra passes, each touching only the
still-unknown hosts.  The result lands in the dns table / StateStore and
every downstream read is a broadcast join — live I/O never sits on the
fetch hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DNS_SCHEMA = ("host string, a_records array<string>, "
              "aaaa_records array<string>, cname_target string")


class StdlibResolver:
    """``socket.getaddrinfo``-backed resolver — works everywhere, no CNAME
    visibility, OS-configured nameservers only."""

    def __init__(self, timeout_s: float = 2.0):
        self.timeout_s = timeout_s  # getaddrinfo has no per-call timeout
        # knob; kept for interface parity (the OS resolver applies its own)

    def __call__(self, host: str) -> dict:
        import socket

        a: list = []
        aaaa: list = []
        try:
            for family, proto in ((socket.AF_INET, a), (socket.AF_INET6, aaaa)):
                try:
                    infos = socket.getaddrinfo(
                        host, None, family, socket.SOCK_STREAM
                    )
                except socket.gaierror:
                    continue
                proto.extend(info[4][0] for info in infos)
        except Exception:
            pass
        return {"a": sorted(set(a)), "aaaa": sorted(set(aaaa)), "cname": None}


class DnspythonResolver:
    """dnspython-backed resolver — custom nameservers + timeout + CNAME,
    utils.py:107-169 semantics.  Import-gated (absent in this container)."""

    def __init__(self, resolvers: list | None = None, timeout_s: float = 2.0):
        import dns.resolver  # import-gated

        self._mod = dns
        r = dns.resolver.Resolver()
        r.lifetime = timeout_s
        r.timeout = timeout_s
        if resolvers:
            r.nameservers = list(resolvers)
        self._resolver = r

    def __call__(self, host: str) -> dict:
        dns = self._mod
        out = {"a": [], "aaaa": [], "cname": None}
        for rtype, key in (("A", "a"), ("AAAA", "aaaa")):
            try:
                ans = self._resolver.resolve(host, rtype)
                out[key] = sorted({str(rec) for rec in ans})
            except Exception:
                pass
        try:
            ans = self._resolver.resolve(host, "CNAME")
            target = str(ans[0].target).rstrip(".")
            out["cname"] = target or None
        except Exception:
            pass
        return out


def resolve_hosts_df(
    hosts: DataFrame,
    resolver_factory,
    host_col: str = "host",
    partitions: int = 32,
    concurrency: int = 32,
) -> DataFrame:
    """One resolution pass: DISTINCT hosts -> ``mapInPandas`` -> dns-table
    rows.  ``resolver_factory()`` is built once per partition; lookups
    within a partition overlap on a thread pool (blocking resolvers) —
    ``concurrency`` in flight per task."""

    def run(batches):
        import pandas as pd
        from concurrent.futures import ThreadPoolExecutor

        resolver = resolver_factory()
        with ThreadPoolExecutor(max_workers=concurrency) as pool:
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                hosts_list = pdf["host"].tolist()
                results = list(pool.map(resolver, hosts_list))
                yield pd.DataFrame({
                    "host": hosts_list,
                    "a_records": [r.get("a") or [] for r in results],
                    "aaaa_records": [r.get("aaaa") or [] for r in results],
                    "cname_target": [r.get("cname") for r in results],
                })

    distinct = (
        hosts.select(F.col(host_col).alias("host"))
        .where(F.col("host").isNotNull() & (F.col("host") != ""))
        .distinct()
        .repartition(partitions)
    )
    return distinct.mapInPandas(run, schema=DNS_SCHEMA)


def build_dns_table(
    spark: SparkSession,
    hosts: DataFrame,
    resolver_factory,
    host_col: str = "host",
    max_chain: int = 3,
    partitions: int = 32,
    concurrency: int = 32,
    known: DataFrame | None = None,
) -> DataFrame:
    """Resolve ``hosts`` plus every CNAME target reachable within the chain
    cap (max_chain=3 -> at most 2 follow-up rounds, scanner.py:50), so the
    returned table satisfies :func:`dnsresolve.resolve_cname_chain`'s
    unrolled joins.  ``known`` (an existing dns-cache table) short-circuits
    already-resolved hosts — the A26 cache as a left-anti join."""
    table = known
    frontier = hosts.select(F.col(host_col).alias("host"))
    for _round in range(max_chain):
        if table is not None:
            frontier = frontier.join(
                table.select(F.lower("host").alias("_k")),
                F.lower(frontier["host"]) == F.col("_k"),
                "left_anti",
            )
        resolved = resolve_hosts_df(
            frontier, resolver_factory, "host", partitions, concurrency
        ).localCheckpoint()  # one live-I/O pass per round, reused below
        if not resolved.take(1):
            break
        table = resolved if table is None else table.unionByName(resolved)
        frontier = resolved.where(
            F.col("cname_target").isNotNull() & (F.col("cname_target") != "")
        ).select(F.col("cname_target").alias("host"))
    return table if table is not None else resolve_hosts_df(
        frontier, resolver_factory, "host", partitions, concurrency
    )
