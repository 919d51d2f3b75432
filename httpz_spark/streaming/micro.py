"""Structured-Streaming front door for the crawl engine.

The reference consumes an unbounded domain stream through a bounded asyncio
queue (``scanner.py:382-464``); the engine's batch waves already give
memory-flat behavior, so streaming input reduces to **continuous frontier
ingestion**: a ``readStream`` source of seed URLs is folded into the
frontier table via ``foreachBatch`` (idempotent merge on url_hash), and the
wave loop drains it on its own cadence.  This keeps ALL crawl state in the
checkpointed state tables rather than the streaming state store — resume
semantics stay identical to batch (SURVEY.md §2 Part B: "iterative batch
waves ... optional foreachBatch wrapper").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from httpz_spark.plans.frontier import FRONTIER_COLS, CrawlEngine, urls_to_frontier
from httpz_spark.storage import release_local_checkpoint


class StreamingSeedIngest:
    """Fold a streaming source of raw seed URLs into the engine's frontier."""

    def __init__(self, engine: CrawlEngine, url_col: str = "value"):
        self.engine = engine
        self.url_col = url_col
        self.n_batches = 0

    def ingest_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """foreachBatch sink: canonicalize + hash the seeds and merge them
        into the frontier (new-URL-wins is irrelevant — rows are identical
        by construction, so the merge is a pure dedup)."""
        store = self.engine.store
        new = urls_to_frontier(batch_df, self.url_col, depth=0, wave_id=0)
        cur = store.read("frontier")
        if cur is not None:
            new = cur.select(*FRONTIER_COLS).unionByName(new)
        # already-crawled URLs re-submitted by the stream are dropped by the
        # wave's seen anti-join; here we only dedup within the frontier
        store.write("frontier", new.dropDuplicates(["url_hash"]))
        self.n_batches += 1

    def start(self, seed_dir: str, checkpoint_dir: str, available_now: bool = True):
        """Attach to a text-file seed directory (one URL per line).  With
        ``available_now`` the query drains existing files and stops —
        suitable for cron-style incremental ingestion; without it the query
        tails the directory continuously."""
        stream = self.engine.spark.readStream.format("text").load(seed_dir)
        writer = (
            stream.writeStream.foreachBatch(self.ingest_batch)
            .option("checkpointLocation", checkpoint_dir)
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()


def ingest_and_crawl(
    engine: CrawlEngine, seed_dir: str, checkpoint_dir: str, max_waves: int = 10
) -> DataFrame:
    """One micro-batch cycle: drain available seed files into the frontier,
    then run waves until drained — the streaming analogue of scan()."""
    q = StreamingSeedIngest(engine).start(seed_dir, checkpoint_dir, available_now=True)
    q.awaitTermination()
    if not engine.store.exists("frontier"):
        raise RuntimeError("no seeds ingested")
    return engine.crawl(max_waves=max_waves)


# ---------------------------------------------------------------------------
# watermarked windowed metrics + custom stateful dedup (SURVEY §2 Part B
# streaming/stateful rows): the two Structured-Streaming shapes the batch
# engine doesn't need internally but a production deployment watches.
# ---------------------------------------------------------------------------

def crawl_rate_metrics(
    events: DataFrame,
    window_secs: int = 60,
    slide_secs: int | None = None,
    watermark_secs: int = 120,
) -> DataFrame:
    """Per-(host, time-window) crawl telemetry over a stream of fetch events
    ``(ts timestamp, host string, status int, latency_ms double)``.

    Late events are handled with an event-time watermark: rows later than
    ``watermark_secs`` behind the max seen event time are dropped and the
    window state is evicted — bounded state at any stream length (the
    streaming analogue of the batch lineage table)."""
    win = F.window(
        F.col("ts"),
        f"{window_secs} seconds",
        f"{slide_secs or window_secs} seconds",
    )
    return (
        events.withWatermark("ts", f"{watermark_secs} seconds")
        .groupBy(win.alias("win"), F.col("host"))
        .agg(
            F.count("*").alias("n_fetched"),
            F.sum(F.when(F.col("status") < 0, 1).otherwise(0)).alias("n_errors"),
            F.avg("latency_ms").alias("avg_latency_ms"),
        )
    )


def streaming_unseen_flagged(
    stream_df: DataFrame,
    partitions: int = 32,
    url_hash_col: str = "url_hash",
    url_col: str = "raw",
    capacity_per_group: int = 1_000_000,
    bits_per_key: int = 10,
) -> DataFrame:
    """Stateful bloom pre-filter for streaming URL-seen dedup —
    ``applyInPandasWithState`` keyed on ``pmod(url_hash, partitions)``.

    State per group is a FIXED-SIZE bloom bit array (``m/8`` bytes from
    ``capacity_per_group × bits_per_key``), OR-updated per micro-batch —
    O(bits), never O(keys): at a 10^10-URL stream the state neither grows
    nor re-pickles a growing set (the round-2 design's scale-killer).
    Reuses the batch path's bloom kernels
    (:mod:`httpz_spark.operators.frontier_dedup`).

    Emitted rows carry ``maybe_seen``: False = bloom miss = **provably
    first-ever** occurrence (a bloom never false-negatives); True = needs
    the exact re-check against the durable seen table
    (:func:`start_streaming_unseen` wires that in ``foreachBatch``).
    Exact in-batch duplicates are dropped here (bounded batch-local set).
    An overfull bloom degrades to more maybe-rows (more exact-check work),
    NEVER to wrong output — tested with a deliberately undersized bloom.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    from httpz_spark.operators.frontier_dedup import (
        _bloom_geometry,
        bloom_maybe,
        bloom_or_keys,
    )

    m, k = _bloom_geometry(capacity_per_group, bits_per_key)
    nbytes = m // 8

    def dedup(key, pdfs, state):
        bits = (
            np.frombuffer(state.get[0], dtype=np.uint8).copy()
            if state.exists else np.zeros(nbytes, dtype=np.uint8)
        )
        out_h: list = []
        out_u: list = []
        out_m: list = []
        batch_keys: set = set()  # batch-scoped only — discarded after
        for pdf in pdfs:
            keys = pdf[url_hash_col].to_numpy(dtype=np.int64)
            urls = pdf[url_col].tolist()
            maybe = bloom_maybe(bits, m, k, keys)
            for i in range(len(keys)):
                h = int(keys[i])
                if h in batch_keys:
                    continue  # exact in-batch dup
                batch_keys.add(h)
                out_h.append(h)
                out_u.append(urls[i])
                out_m.append(bool(maybe[i]))
            bloom_or_keys(bits, m, k, keys)
        state.update((bits.tobytes(),))  # fixed nbytes every batch
        yield pd.DataFrame(
            {url_hash_col: pd.Series(out_h, dtype="int64"),
             url_col: out_u,
             "maybe_seen": pd.Series(out_m, dtype="bool")}
        )

    return (
        stream_df.withColumn("_pid", F.pmod(F.col(url_hash_col), F.lit(partitions)))
        .groupBy("_pid")
        .applyInPandasWithState(
            dedup,
            outputStructType=f"{url_hash_col} long, {url_col} string, maybe_seen boolean",
            stateStructType="bits binary",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def start_streaming_unseen(
    stream_df: DataFrame,
    out_dir: str,
    seen_dir: str,
    checkpoint_dir: str,
    partitions: int = 32,
    url_hash_col: str = "url_hash",
    url_col: str = "raw",
    capacity_per_group: int = 1_000_000,
    bits_per_key: int = 10,
    available_now: bool = True,
):
    """Exact streaming URL-seen dedup end-to-end: bloom-flagged stateful
    stage + ``foreachBatch`` exact resolution.

    Per micro-batch: bloom-miss rows pass straight through; maybe-seen rows
    are anti-joined against the durable seen table (``seen_dir`` parquet —
    production: the Iceberg seen table with a batch_id predicate).

    Exactly-once under batch REDELIVERY: both sinks are written per-batch
    with overwrite (``.../batch_id=N``), and the anti-join consults only
    seen batches **< N** — so a batch replayed after a crash between the
    two writes re-derives the identical accepted set (its own partial seen
    write is excluded and simply overwritten).  The round-3 design appended
    accepted keys to a flat seen dir BEFORE writing the output, so a crash
    between the writes made the replay anti-join the batch against its own
    keys, silently dropping first-ever rows (round-3 review finding).
    Output therefore equals first-ever occurrences EXACTLY, for any bloom
    size and any redelivery pattern."""
    flagged = streaming_unseen_flagged(
        stream_df, partitions, url_hash_col, url_col,
        capacity_per_group, bits_per_key,
    )
    handle = make_unseen_batch_handler(out_dir, seen_dir, url_hash_col)

    writer = (
        flagged.writeStream.foreachBatch(handle)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def make_unseen_batch_handler(out_dir: str, seen_dir: str,
                              url_hash_col: str = "url_hash",
                              horizon: int = 4):
    """The ``foreachBatch`` exact-resolution handler of
    :func:`start_streaming_unseen`, exposed so redelivery semantics are
    directly testable (call it twice with the same batch_id = a replay).

    Long-run shape (round-4 verdict fix): per-batch seen dirs are kept
    only inside the redelivery ``horizon``; every batch folds dirs older
    than ``batch_id - horizon`` into a base :class:`StateStore` table
    (atomic versioned commits, read fan-in bounded by ITS compaction), so
    ``seen_before`` reads base + at most ``horizon`` batch dirs — never
    the O(total batches) path list the round-3 design degenerated to at
    batch 10^4.

    Why compaction preserves exactly-once under redelivery: Structured
    Streaming replays only the LATEST uncommitted batch N, and every dir
    folded while batch N runs has id < N - horizon ≤ N - 1 — a replayed
    batch can never find its own keys in the base.  A crash between the
    base commit and the dir deletion re-folds the same keys on replay:
    duplicate ROWS in the base, which the anti-join (set semantics)
    ignores.  In production the base table is the Iceberg seen table;
    ``StateStore`` is its sandbox stand-in (same contract —
    ``plans/statestore.py`` module docstring)."""
    import os
    import shutil

    from httpz_spark.plans.statestore import StateStore

    base_root = os.path.join(seen_dir, "_base")

    def _store(spark) -> "StateStore":
        return StateStore(spark, base_root)

    def recent_seen_dirs(batch_id: int) -> list:
        """Per-batch seen dirs with id strictly below ``batch_id`` —
        explicit directory listing, not a blanket try/except (a transient
        read error must FAIL the batch, not silently emit duplicates).
        Exposed for the compaction-bound tests."""
        paths = []
        if os.path.isdir(seen_dir):
            for name in os.listdir(seen_dir):
                if not name.startswith("batch_id="):
                    continue
                try:
                    n = int(name.split("=", 1)[1])
                except ValueError:
                    continue
                if n < batch_id:
                    paths.append((n, os.path.join(seen_dir, name)))
        return sorted(paths)

    def seen_before(spark, batch_id: int):
        """Seen keys of committed batches strictly before ``batch_id``:
        compacted base ∪ the ≤ horizon recent per-batch dirs."""
        store = _store(spark)
        base = store.read("seen") if store.exists("seen") else None
        parts = [] if base is None else [base.select(url_hash_col)]
        paths = [p for _, p in recent_seen_dirs(batch_id)]
        if paths:
            parts.append(spark.read.parquet(*paths).select(url_hash_col))
        if not parts:
            return None
        out = parts[0]
        for extra in parts[1:]:
            out = out.unionByName(extra)
        return out

    def compact_seen(spark, batch_id: int) -> None:
        """Fold committed batch dirs older than the redelivery horizon
        into the base table, then drop them.  Every folded batch is
        committed (all ids < the running batch are), and deletion happens
        only after the store's atomic commit."""
        fold = recent_seen_dirs(batch_id - horizon)
        if not fold:
            return
        keys = spark.read.parquet(*[p for _, p in fold]).select(url_hash_col)
        _store(spark).append("seen", keys)
        for _, p in fold:
            shutil.rmtree(p, ignore_errors=True)

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        definite = batch_df.filter(~F.col("maybe_seen"))
        maybe = batch_df.filter(F.col("maybe_seen"))
        prior = seen_before(spark, batch_id)
        rechecked = (
            maybe.join(prior, url_hash_col, "left_anti")
            if prior is not None else maybe
        )
        accepted = (
            definite.unionByName(rechecked).drop("maybe_seen").localCheckpoint()
        )
        accepted.select(url_hash_col).write.mode("overwrite").parquet(
            os.path.join(seen_dir, f"batch_id={batch_id}")
        )
        accepted.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch_id={batch_id}")
        )
        compact_seen(spark, batch_id)
        # checkpoint blocks bypass the CacheManager (storage.py): without
        # an explicit release a long run accretes O(total batches) storage
        release_local_checkpoint(accepted)

    handle.recent_seen_dirs = recent_seen_dirs  # test hooks
    handle.seen_before = seen_before
    return handle
