"""Live-DNS adapter semantics, tested with an injected fake resolver (the
dnspython backend is import-gated/absent here; the semantics under test are
the reference's — utils.py:107-169): sorted-dedup A/AAAA, bounded CNAME
follow-up rounds, loop/case handling via the downstream join operators, and
the cache short-circuit."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from httpz_spark.operators.dnslive import (
    StdlibResolver,
    build_dns_table,
    resolve_hosts_df,
)
from httpz_spark.operators.dnsresolve import resolve_cname_chain, resolve_ips

# chain: a -> b -> c -> d (longer than the cap); loop: x -> y -> x
FAKE_ZONE = {
    "a.test": {"a": ["10.0.0.2", "10.0.0.1", "10.0.0.2"], "aaaa": ["::2", "::1"], "cname": "b.test"},
    "b.test": {"a": ["10.0.1.1"], "aaaa": [], "cname": "c.test"},
    "c.test": {"a": ["10.0.2.1"], "aaaa": ["::c"], "cname": "d.test"},
    "d.test": {"a": ["10.0.3.1"], "aaaa": [], "cname": None},
    "x.test": {"a": ["10.1.0.1"], "aaaa": [], "cname": "Y.test"},
    "y.test": {"a": ["10.1.0.2"], "aaaa": [], "cname": "X.test"},
    "plain.test": {"a": ["10.2.0.1"], "aaaa": ["::9"], "cname": None},
}


def _make_fake_factory(zone):
    # nested closures are cloudpickled BY VALUE (executors cannot import the
    # test module), so everything the resolver needs rides the closure
    def factory():
        def resolve(host):
            rec = zone.get(host.lower())
            if rec is None:
                return {"a": [], "aaaa": [], "cname": None}
            return {"a": sorted(set(rec["a"])),
                    "aaaa": sorted(set(rec["aaaa"])), "cname": rec["cname"]}

        return resolve

    return factory


fake_resolver_factory = _make_fake_factory(dict(FAKE_ZONE))


def _hosts_df(spark, hosts):
    return spark.createDataFrame(pd.DataFrame({"host": hosts}))


def test_single_pass_shape_and_dedup(spark):
    out = resolve_hosts_df(
        _hosts_df(spark, ["a.test", "a.test", "plain.test", None, ""]),
        fake_resolver_factory, partitions=2,
    ).toPandas().set_index("host")
    assert len(out) == 2  # distinct + null/blank dropped before I/O
    assert list(out.loc["a.test", "a_records"]) == ["10.0.0.1", "10.0.0.2"]
    assert out.loc["a.test", "cname_target"] == "b.test"
    assert out.loc["plain.test", "cname_target"] is None


def test_cname_rounds_feed_the_join_operators(spark):
    table = build_dns_table(
        spark, _hosts_df(spark, ["a.test", "plain.test"]),
        fake_resolver_factory, max_chain=3, partitions=2,
    )
    hosts = {r["host"] for r in table.collect()}
    # 3 bounded rounds: seeds, 1st targets, 2nd targets — d.test (4th link)
    # is beyond the chain cap and must NOT be resolved
    assert hosts == {"a.test", "b.test", "c.test", "plain.test"}

    df = _hosts_df(spark, ["a.test", "plain.test"]).withColumnRenamed(
        "host", "base_domain"
    )
    chained = resolve_cname_chain(df, table, max_chain=3)
    got = {r["base_domain"]: (r["cname_chain"], r["scan_target"])
           for r in resolve_ips(chained, table).collect()}
    assert got["a.test"][0] == ["a.test", "b.test", "c.test"]
    assert got["a.test"][1] == "c.test"
    assert got["plain.test"][0] is None  # length-1 chain -> null (A19)
    assert got["plain.test"][1] == "plain.test"


def test_cname_loop_terminates_and_detects(spark):
    table = build_dns_table(
        spark, _hosts_df(spark, ["x.test"]), fake_resolver_factory,
        max_chain=3, partitions=2,
    )
    hosts = {r["host"] for r in table.collect()}
    assert hosts == {"x.test", "Y.test"}  # loop: anti-join stops round 3
    chained = resolve_cname_chain(
        _hosts_df(spark, ["x.test"]).withColumnRenamed("host", "base_domain"),
        table, max_chain=3,
    )
    row = chained.collect()[0]
    # lowercase loop detection (utils.py:126-138): X.test (= x.test) rejected
    assert row["cname_chain"] == ["x.test", "Y.test"]
    assert row["scan_target"] == "Y.test"


def test_known_cache_short_circuits(spark):
    calls = []

    # NOTE: closure-local factory -> cloudpickled by value into executors
    def counting_factory():
        def resolve(host):
            calls.append(host)  # executor-side list; len checked via table
            return {"a": ["10.9.9.9"], "aaaa": [], "cname": None}

        return resolve

    known = resolve_hosts_df(
        _hosts_df(spark, ["plain.test"]), fake_resolver_factory, partitions=1
    ).localCheckpoint()
    table = build_dns_table(
        spark, _hosts_df(spark, ["plain.test", "new.test"]),
        counting_factory, max_chain=3, partitions=1, known=known,
    )
    rows = {r["host"]: r["a_records"] for r in table.collect()}
    # cached row kept verbatim; only the unknown host was re-resolved
    assert rows["plain.test"] == ["10.2.0.1"]
    assert rows["new.test"] == ["10.9.9.9"]


def test_stdlib_resolver_localhost():
    rec = StdlibResolver()("localhost")
    assert "127.0.0.1" in rec["a"]
    assert rec["cname"] is None
