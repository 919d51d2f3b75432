"""Merge-on-read StateStore: O(wave) write amplification, compaction,
version GC, newest-wins resolution, and pointer-swap crash safety."""

import glob
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from httpz_spark.plans.statestore import StateStore


@pytest.fixture()
def root():
    d = tempfile.mkdtemp(prefix="httpz_store_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _dir_bytes(path):
    return sum(
        os.path.getsize(p)
        for p in glob.glob(os.path.join(path, "**", "*"), recursive=True)
        if os.path.isfile(p)
    )


def test_merge_writes_only_the_delta(spark, root):
    """The headline scale property: merging a small wave into a large seen
    table writes O(wave) bytes, NOT O(table) (the round-1 design rewrote
    the full table per wave)."""
    store = StateStore(spark, root)
    base = spark.range(1_000_000).select(
        F.col("id").alias("url_hash"), F.lit(0).alias("first_wave")
    )
    store.merge_upsert("seen", base, key="url_hash")
    before = _dir_bytes(os.path.join(root, "seen"))

    wave = spark.range(1_000_000, 1_001_000).select(
        F.col("id").alias("url_hash"), F.lit(1).alias("first_wave")
    )
    store.merge_upsert("seen", wave, key="url_hash")
    after = _dir_bytes(os.path.join(root, "seen"))
    written = after - before
    assert written < before / 10, (written, before)  # delta, not a rewrite
    assert store.read("seen").count() == 1_001_000


def test_newest_delta_wins_resolution(spark, root):
    store = StateStore(spark, root)
    store.merge_upsert(
        "t", spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"), key="k"
    )
    store.merge_upsert(
        "t", spark.createDataFrame([(2, "B"), (3, "c")], "k long, v string"), key="k"
    )
    got = {r["k"]: r["v"] for r in store.read("t").collect()}
    assert got == {1: "a", 2: "B", 3: "c"}


def test_compaction_bounds_delta_chain(spark, root):
    store = StateStore(spark, root, compact_every=4)
    for i in range(10):
        store.merge_upsert(
            "t", spark.createDataFrame([(i, i * 10)], "k long, v long"), key="k"
        )
    v = store.latest_version("t")
    manifest = store._read_manifest("t", v)
    assert len(manifest["deltas"]) <= 4
    got = {r["k"]: r["v"] for r in store.read("t").collect()}
    assert got == {i: i * 10 for i in range(10)}


def test_gc_prunes_old_versions_keeping_previous(spark, root):
    store = StateStore(spark, root, compact_every=3)
    for i in range(8):
        store.merge_upsert(
            "t", spark.createDataFrame([(i, i)], "k long, v long"), key="k"
        )
    tdir = os.path.join(root, "t")
    manifests = [f for f in os.listdir(tdir) if f.startswith("v=")]
    v = store.latest_version("t")
    # only current + previous manifests retained
    assert sorted(manifests) == [f"v={v - 1}.json", f"v={v}.json"]
    # every surviving delta is referenced by one of the two live manifests
    live = set(store._read_manifest("t", v)["deltas"]) | set(
        store._read_manifest("t", v - 1)["deltas"]
    )
    on_disk = {f for f in os.listdir(tdir) if f.startswith("delta-")}
    assert on_disk == live
    assert store.read("t").count() == 8


def test_kill_before_pointer_swap_leaves_previous_readable(spark, root):
    store = StateStore(spark, root)
    store.write("t", spark.createDataFrame([(1,)], "k long"))
    # simulate a crash: delta + manifest of v2 land, pointer never swaps
    df = spark.createDataFrame([(2,)], "k long")
    store._write_delta("t", df, 2, "merge")
    store._write_manifest("t", 2, {"deltas": ["delta-000002-merge"], "key": None})
    assert store.latest_version("t") == 1
    assert store.read("t").count() == 1  # previous snapshot intact
    # the idempotent re-run overwrites v2 cleanly
    store.write("t", spark.createDataFrame([(2,), (3,)], "k long"))
    assert store.read("t").count() == 2


def test_append_accumulates(spark, root):
    store = StateStore(spark, root, compact_every=3)
    for i in range(7):
        store.append("lineage", spark.createDataFrame([(i,)], "wave_id int"))
    rows = sorted(r["wave_id"] for r in store.read("lineage").collect())
    assert rows == list(range(7))
