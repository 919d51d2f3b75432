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


def streaming_unseen(
    stream_df: DataFrame,
    partitions: int = 32,
    url_hash_col: str = "url_hash",
    url_col: str = "raw",
) -> DataFrame:
    """Exactly-once streaming URL-seen dedup — ``applyInPandasWithState``
    keyed on ``pmod(url_hash, partitions)``; each group's state is its seen
    hash set (a pickled python set in a binary state column, the streaming
    analogue of the per-partition BloomIndex).  Emits only first-ever
    occurrences ACROSS micro-batches; state persists in the streaming
    checkpoint, so a restarted query keeps suppressing (tested)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    def dedup(key, pdfs, state):
        import pickle

        seen = pickle.loads(state.get[0]) if state.exists else set()
        rows = []
        for pdf in pdfs:
            for uh, url in zip(pdf[url_hash_col].tolist(), pdf[url_col].tolist()):
                if uh not in seen:
                    seen.add(uh)
                    rows.append((uh, url))
        state.update((pickle.dumps(seen),))
        yield pd.DataFrame(rows, columns=[url_hash_col, url_col])

    return (
        stream_df.withColumn("_pid", F.pmod(F.col(url_hash_col), F.lit(partitions)))
        .groupBy("_pid")
        .applyInPandasWithState(
            dedup,
            outputStructType=f"{url_hash_col} long, {url_col} string",
            stateStructType="seen binary",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
