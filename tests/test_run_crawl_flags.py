"""run_crawl CLI: the round-6 scheduling knobs reach the engine.

In-process invocation of scripts/run_crawl.main (no subprocess — the
spark-submit deployment path is covered by tests/test_spark_submit.py);
this pins that --trap-max-urls / --adaptive-politeness actually wire
into EngineConfig and that the crawl completes with the guard active:
trap bookkeeping writes the template_counts state table and AIMD writes
host_budgets.
"""

import importlib.util
import json
import os
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_run_crawl():
    spec = importlib.util.spec_from_file_location(
        "run_crawl_under_test", os.path.join(_REPO, "scripts", "run_crawl.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_run_crawl_trap_and_aimd_flags(spark, tmp_path, capsys):
    seeds = tmp_path / "seeds.txt"
    seeds.write_text("h0.test\nh1.test\nh2.test\nh3.test\n")
    state = str(tmp_path / "state")
    rc = _load_run_crawl().main([
        "--seeds", str(seeds), "--state", state,
        "--waves", "2", "--n-images", "16", "--n-hosts", "4",
        "--partitions", "4", "--budget", "50",
        "--trap-max-urls", "1000", "--trap-keep", "8",
        "--adaptive-politeness", "--slow-latency-ms", "500",
    ])
    assert rc == 0
    summary = json.loads(
        [ln for ln in capsys.readouterr().out.splitlines()
         if ln.startswith("{")][-1])
    assert summary["results"] > 0
    assert summary["results"] == summary["unique_urls"]

    # the knobs reached the engine: both state tables exist and are sane
    from httpz_spark.plans.statestore import StateStore
    store = StateStore(spark, state)
    tpl = store.read("template_counts")
    assert tpl is not None and tpl.count() > 0
    assert set(tpl.columns) >= {"host", "template", "n_urls", "wave_id"}
    hb = store.read("host_budgets")
    assert hb is not None and hb.count() > 0
    budgets = {r["host"]: r["budget"] for r in hb.collect()}
    assert all(1 <= b <= 50 for b in budgets.values()), budgets
