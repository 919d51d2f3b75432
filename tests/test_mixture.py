"""Data-mixture epoch planning (operators/mixture.py)."""

import hashlib

import pytest

from httpz_spark.operators.mixture import mixture_manifest, mixture_plan


def _corpus(spark):
    rows = []
    for i in range(40):
        rows.append((i, "wiki", "word " * 10))         # 400 wiki tokens
    for i in range(40, 200):
        rows.append((i, "crawl", "word " * 10))        # 1600 crawl tokens
    return spark.createDataFrame(
        [(i, s, t.strip()) for i, s, t in rows],
        "doc_id long, source string, text string",
    )


def test_plan_epochs(spark):
    # budget 2000, weights 1:1 -> each source targets 1000 tokens:
    # wiki has 400 available -> 2.5 epochs; crawl has 1600 -> 0.625
    plan = {p["source"]: p for p in
            mixture_plan(_corpus(spark), {"wiki": 1.0, "crawl": 1.0}, 2000)}
    assert plan["wiki"]["available_tokens"] == 400
    assert plan["crawl"]["available_tokens"] == 1600
    assert plan["wiki"]["repeats"] == pytest.approx(2.5)
    assert plan["wiki"]["base_copies"] == 2
    assert plan["wiki"]["frac"] == pytest.approx(0.5)
    assert plan["crawl"]["repeats"] == pytest.approx(0.625)
    assert plan["crawl"]["base_copies"] == 0


def test_manifest_copies_and_expectation(spark):
    m = mixture_manifest(_corpus(spark), {"wiki": 1.0, "crawl": 1.0}, 2000)
    rows = m.collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    # every wiki doc appears (base 2, maybe 3); crawl docs only via the
    # fractional bernoulli (0 or 1) so some are absent
    wiki = by_src["wiki"]
    assert len(wiki) == 40
    assert all(r["n_copies"] in (2, 3) for r in wiki)
    crawl = by_src.get("crawl", [])
    assert 0 < len(crawl) < 160
    assert all(r["n_copies"] == 1 for r in crawl)
    # expectation check (deterministic hash, not a statistical bound):
    # realized tokens within 25% of the 1000-token target per source
    for s, target in (("wiki", 1000), ("crawl", 1000)):
        got = sum(r["n_tokens"] * r["n_copies"] for r in by_src.get(s, []))
        assert abs(got - target) / target < 0.25, (s, got)


def test_manifest_deterministic_and_hash_rule(spark):
    d = _corpus(spark)
    a = sorted(tuple(r) for r in
               mixture_manifest(d, {"wiki": 1.0, "crawl": 1.0}, 2000).collect())
    b = sorted(tuple(r) for r in
               mixture_manifest(d.repartition(7),
                                {"wiki": 1.0, "crawl": 1.0}, 2000).collect())
    assert a == b  # partitioning-independent
    # the +1 rule is exactly u(md5) < frac
    rows = {r[0]: r for r in a}
    for i in range(40):  # wiki docs: frac 0.5
        u = (int(hashlib.md5(f"mix:{i}".encode()).hexdigest()[:13], 16) + 0.5) / 2**52
        assert rows[i][3] == 2 + (1 if u < 0.5 else 0)


def test_zero_weight_drops_source(spark):
    m = mixture_manifest(_corpus(spark), {"wiki": 1.0, "crawl": 0.0}, 800)
    rows = m.collect()
    assert {r["source"] for r in rows} == {"wiki"}
    # wiki target 800 over 400 available -> exactly 2 copies each
    assert all(r["n_copies"] == 2 for r in rows)


def test_validation(spark):
    d = _corpus(spark)
    with pytest.raises(ValueError):
        mixture_plan(d, {}, 100)
    with pytest.raises(ValueError):
        mixture_plan(d, {"wiki": -1.0}, 100)
    with pytest.raises(ValueError):
        mixture_plan(d, {"wiki": 0.0}, 100)  # weights sum to zero
