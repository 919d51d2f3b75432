"""Physical-plan shape assertions — the scale claims as executable
invariants instead of prose.

At 100 TB the difference between a good and a bad plan is not visible in a
row-count test: a filter that fails to reach the parquet scan, a dimension
join that degrades to sort-merge, or a native expression that silently
falls back to a row-at-a-time Python UDF all still produce correct rows.
These tests pin the plan properties the engine's design depends on:

* predicate pushdown + column pruning reach the parquet scan,
* small-dimension joins are BroadcastHashJoin, dedup is a LeftAnti join,
* the native kernel queries run inside WholeStageCodegen,
* and — globally, for EVERY contract query — no row-at-a-time Python UDF
  (``BatchEvalPython``) appears anywhere; Python stages are exclusively
  Arrow-batched (``ArrowEvalPython`` / ``MapInPandas``/``FlatMapGroupsInPandas``).
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E  # noqa: E402


def plan_of(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_filter_pushdown_and_column_pruning(spark, sf_dir):
    p = plan_of(E.queries()["status_match_filter"](spark, sf_dir))
    assert "PushedFilters:" in p
    # the isin/between predicates must reach the scan, not sit above it
    assert "In(event_type" in p and "GreaterThanOrEqual(value,10" in p, p
    # column pruning: the scan reads only the 3 referenced columns
    readschema = [ln for ln in p.splitlines() if "ReadSchema" in ln][0]
    assert "event_id" in readschema and "event_type" in readschema
    assert "user_id" not in readschema, readschema


def test_dimension_joins_broadcast(spark, sf_dir):
    p = plan_of(E.queries()["robots_broadcast_join"](spark, sf_dir))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p, p


def test_seen_dedup_is_anti_join(spark, sf_dir):
    p = plan_of(E.queries()["seen_antijoin"](spark, sf_dir))
    assert "LeftAnti" in p, p


def test_native_kernels_stay_jvm_side(spark, sf_dir):
    """The scalar-kernel queries are pure JVM: whole-stage codegen where
    Spark supports it, and NO Python evaluation of any kind.  (Projections
    containing higher-order functions — transform/filter lambdas — are
    CodegenFallback by Spark design and evaluate as interpreted JVM
    expressions; they must still never fall to Python.)"""
    for name in ("text_stats", "url_canonicalize", "human_size",
                 "winnow_fingerprints", "lang_id"):
        df = E.queries()[name](spark, sf_dir)
        exec_plan = df._jdf.queryExecution().executedPlan().toString()
        assert "*(" in exec_plan, f"{name}: no codegen stage at all"
        p = plan_of(df)
        assert "BatchEvalPython" not in p, name
        assert "ArrowEvalPython" not in p, (
            f"{name} claims pure-native but plans a pandas UDF")
    # queries without HOF lambdas must codegen their projection itself:
    # >= 2 codegen subtrees (scan conversion + the projection)
    for name in ("url_canonicalize", "human_size"):
        df = E.queries()[name](spark, sf_dir)
        exec_plan = df._jdf.queryExecution().executedPlan().toString()
        assert exec_plan.count("*(") >= 2, f"{name}: projection fell out of codegen"


# Queries whose plan is a plain scan of an already-materialized result
# (eager barriers / state-table reads) — their interesting plans execute at
# construction time and are covered by the operator-level tests above.
_MATERIALIZED = {"ngram_jaccard_dups", "minhash_lsh_dups", "dedup_clusters",
                 "training_shard", "crawl_single_wave", "frontier_crawl"}


def test_no_rowwise_python_udf_in_any_contract_query(spark, sf_dir):
    """The SURVEY §2 mandate ("no per-row Python UDFs anywhere") as a test:
    every contract query's physical plan is free of BatchEvalPython.
    Arrow-batched stages (ArrowEvalPython / MapInPandas) are the sanctioned
    Python escape hatch and remain allowed."""
    qs = E.queries()
    for name, q in qs.items():
        df = q(spark, sf_dir)
        p = plan_of(df)
        assert "BatchEvalPython" not in p, f"{name} plans a row-wise Python UDF"


def test_dedup_pair_plan_shapes_lazy(spark, sf_dir):
    """The pair generators' interesting plan (hidden behind the eager
    barrier in the default path): candidates come from equi self-joins —
    never a cartesian/nested-loop product."""
    from httpz_spark.operators.dedup import minhash_lsh_pairs, ngram_jaccard_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    for fn, kw in ((ngram_jaccard_pairs, {"threshold": 0.2}),
                   (minhash_lsh_pairs, {"jaccard_threshold": 0.2})):
        p = plan_of(fn(docs, eager=False, **kw))
        assert "CartesianProduct" not in p, fn.__name__
        assert "BroadcastNestedLoopJoin" not in p, fn.__name__
        assert "BatchEvalPython" not in p, fn.__name__


# ---------------------------------------------------------------------------
# pre-barrier crawl pipeline (round-4 verdict #6): the wave loop
# materializes _schedule/_fetch results, so their LAZY plans — the
# interesting ones — are pinned here directly on the engine's own frames.
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def crawl_frames(spark, tmp_path_factory):
    """(scheduled, deferred, fetch_out) lazy frames of one engine wave
    over a small fabric — built once, asserted on by the tests below."""
    from httpz_spark.config import EngineConfig, ScanConfig
    from httpz_spark.plans.frontier import CrawlEngine
    from httpz_spark.sources import fabric as FB
    from httpz_spark.sources import synthetic as S

    world = FB.FabricConfig(n_images=64, n_hosts=12).with_certs()
    state = str(tmp_path_factory.mktemp("plan_state"))
    # persisted, as in production where `images` is a STORED table — the
    # synthetic builder's own MapInPandas must not masquerade as a wave
    # python stage in the assertions below
    images = S.images_df(spark, world, partitions=4).persist()
    images.count()
    seeds = S.seeds_df(spark, [
        f"https://{FB.host_for_image(FB.image_id_at(i), world)}"
        f"/li/{FB.image_id_at(i)}" for i in range(64)
    ])
    eng = CrawlEngine(
        spark, images, dns=None, robots=S.robots_df(spark, world),
        scan_cfg=ScanConfig.all_on(),
        engine_cfg=EngineConfig(partitions=8, per_host_budget=4,
                                politeness_pre_salt=8, salt_buckets=4,
                                hot_host_threshold=4, use_bloom=False,
                                include_payload=True),
        fabric_cfg=world, state_dir=state,
    )
    eng.init_frontier(seeds)
    frontier = eng.store.read("frontier")
    scheduled, deferred = eng._schedule(frontier)
    return scheduled, deferred, eng._fetch(scheduled, 0)


def test_wave_has_exactly_one_python_stage(spark, crawl_frames):
    """The whole wave (schedule + fetch + payload join) plans EXACTLY one
    MapInPandas — the fetch stage.  Everything else (canonicalize,
    politeness, salting, joins) stays JVM-side."""
    _s, _d, out = crawl_frames
    p = plan_of(out, mode="simple")  # one tree, no details section —
    # a single node appears exactly once
    assert p.count("MapInPandas fetch_batches") == 1, p
    # any other MapInPandas occurrence is the cached images table printing
    # its build recipe inside its InMemoryRelation — never an executed
    # wave stage
    for ln in p.splitlines():
        if "MapInPandas" in ln:
            assert "fetch_batches" in ln or " gen(" in ln, ln
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p


def test_payload_join_sits_after_fetch_stage(spark, crawl_frames):
    """Heavy payload BYTES join only the fetched rows: in the plan tree the
    payload join is an ANCESTOR of the MapInPandas fetch stage (parents
    print before children in explain output), while the light-meta join
    rides below it — bytes never cross the pre-fetch shuffle."""
    _s, _d, out = crawl_frames

    def walk(node):
        yield node
        for i in range(node.children().size()):
            yield from walk(node.children().apply(i))

    def out_names(node):
        return {node.output().apply(i).name()
                for i in range(node.output().size())}

    root = out._jdf.queryExecution().optimizedPlan()
    fetch_nodes = [n for n in walk(root)
                   if n.nodeName() == "MapInPandas"
                   and "fetch_batches" in n.toString().splitlines()[0]]
    assert len(fetch_nodes) == 1, [n.nodeName() for n in walk(root)]
    # the fetch INPUT carries no payload bytes, and no shuffle under the
    # fetch stage moves them (the cached images relation itself lists its
    # full schema at the logical level — pruning lands in the physical
    # InMemoryTableScan — so assert on the exchanges and the stage input,
    # which is the actual "bytes never ride the pre-fetch shuffle" claim)
    fetch_input = fetch_nodes[0].children().apply(0)
    assert "bytes" not in out_names(fetch_input), fetch_input.toString()
    for n in walk(fetch_nodes[0]):
        if "Repartition" in n.nodeName() or "Exchange" in n.nodeName():
            assert "bytes" not in out_names(n), n.toString().splitlines()[0]
    # ...but the wave OUTPUT has them: the payload join is an ancestor of
    # the fetch stage (include_payload post-fetch join)
    assert "bytes" in out_names(root)
    # and the light meta (caption) DOES ride into the fetch stage
    assert any("caption" in out_names(n) for n in walk(fetch_nodes[0]))


def test_politeness_window_input_is_salted(spark, crawl_frames):
    """The per-host ranking must never sort one hot host in a single task:
    with pre_salt > 1 the rank window partitions on (host, priority
    bucket, hash bucket) — the _pb/_hb salt columns — and an exact-offset
    join restores global ranks."""
    s, _d, _o = crawl_frames
    p = plan_of(s)
    w = [ln for ln in p.splitlines() if "row_number" in ln
         and "windowspecdefinition" in ln]
    assert w, p
    assert all("_hb" in ln and "_pb" in ln for ln in w), w


def test_fetch_stage_input_salted_by_rank(spark, crawl_frames):
    """The fetch repartition spreads hot hosts by the politeness rank
    (floor((rank-1)/target)) — deterministic, perfectly balanced, no
    extra pass (adaptive mode of salted_repartition)."""
    _s, _d, out = crawl_frames
    p = plan_of(out)
    ex = [ln for ln in p.splitlines()
          if "hashpartitioning" in ln and "host" in ln]
    assert ex, p
    assert any("sched_rank" in ln and "FLOOR" in ln.upper() for ln in ex), ex


def test_scheduled_deferred_split_is_exact_filter(spark, crawl_frames):
    """deferred is the same ranked frame filtered on NOT scheduled — no
    recomputation of the window, no extra shuffle stage beyond the rank's
    own (same Exchange signature in both plans)."""
    s, d, _o = crawl_frames
    ps, pd_ = plan_of(s), plan_of(d)
    for p in (ps, pd_):
        assert "CartesianProduct" not in p and "BatchEvalPython" not in p, p
    # both sides carry the politeness window machinery
    assert "windowspecdefinition" in ps and "windowspecdefinition" in pd_


def test_phash_and_gopher_plan_shapes(spark, sf_dir):
    """The round-5 additions keep the candidate-generation discipline:
    the banded hamming join is an equi self-join (never cartesian), and
    the gopher n-gram signals add no python stages."""
    p = plan_of(E.queries()["phash_near_dups"](spark, sf_dir))
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p, p
    assert "BatchEvalPython" not in p, p
    p = plan_of(E.queries()["gopher_quality"](spark, sf_dir))
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p
    # no python stage anywhere in this query's pipeline (the documents
    # input is a plain parquet scan)
    assert "MapInPandas" not in p, p
    # SINGLE-PASS battery: all 9 n-gram signals (top 2/3/4 + dup 5..10)
    # come from ONE explode of the corpus — exactly one Generate node in
    # the whole physical plan, and no window (the top-gram tie-break is a
    # min(struct) aggregation, not a row_number)
    assert p.count(") Generate") == 1, p  # detail headers: one per node
    assert "windowspecdefinition" not in p, p
