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
