"""The distributed URL-frontier crawl engine — iterative batch waves.

Replaces the reference's bounded asyncio queue + FIRST_COMPLETED pump
(``/root/reference/httpz_scanner/scanner.py:382-464``) with checkpointed
DataFrame waves (SURVEY.md §3.4):

    wave k:  frontier --in-wave dedup--> bloom+anti-join vs seen
             --politeness window (broadcast robots)--> scheduled | deferred
             --salted repartition--> mapInPandas fetch
             --> MERGE results/seen, frontier(k+1) = deferred + discovered

Exactly-once resume (north_rule "a killed job resumes exactly"):

* each wave first materializes its full fetch output as an atomic staging
  snapshot (``wave<k>_out`` / ``wave<k>_deferred``), THEN applies merges
  *from the staging snapshot*;
* the lineage row for wave k is the commit marker — written last;
* a kill at any point re-runs wave k: staging is either rebuilt (the fetch
  fabric is deterministic) or reused; merge_upsert on url_hash is
  idempotent, so the final tables are byte-identical to an uninterrupted
  run (tested in tests/test_frontier.py).

Deterministic crawl order = (wave_id, priority, url_hash); priority = depth
(BFS).  All per-wave metrics land in the ``lineage`` table.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from httpz_spark.config import EngineConfig, ScanConfig
from httpz_spark.functions import urls as U
from httpz_spark.operators.fetch import fetch_output_schema, make_fetch_stage
from httpz_spark.operators.frontier_dedup import (
    BloomIndex,
    CuckooIndex,
    dedup_unseen,
)
from httpz_spark.storage import release_local_checkpoint
from httpz_spark.operators.traps import frontier_trap_split, url_path_template
from httpz_spark.operators.politeness import (
    aimd_host_budgets,
    politeness_schedule,
    salted_repartition,
)
from httpz_spark.plans.scan import META, PAYLOAD, make_url_hash64_udf
from httpz_spark.plans.statestore import StateStore
from httpz_spark.sources.fabric import FabricConfig

FRONTIER_COLS = [
    "url_canon", "url_hash", "host", "path", "scheme", "depth", "priority", "wave_id",
]


def urls_to_frontier(df: DataFrame, url_col: str, depth: int | DataFrame,
                     wave_id: int, priority=None) -> DataFrame:
    """Canonicalize raw URLs into frontier rows — all native expressions
    except the 64-bit identity hash (Arrow-batched murmur3).

    ``priority`` (optional Column over ``df``'s columns, long-castable)
    overrides the default depth-derived crawl priority — the hook for
    real scheduling signals (sitemap ``<priority>``/``<lastmod>`` via
    :func:`~httpz_spark.operators.sitemapfetch.sitemap_seed_priority`,
    recrawl staleness, host quotas).  Lower = fetched earlier; crawl
    order stays the deterministic (wave_id, priority, url_hash)."""
    canon = U.canonicalize_url(F.col(url_col))
    depth_col = F.lit(depth) if isinstance(depth, int) else depth
    cols = [canon.alias("url_canon"), depth_col.cast("int").alias("_depth")]
    if priority is not None:
        cols.append(priority.cast("long").alias("_priority"))
    out = df.select(*cols)
    out = out.filter(F.col("url_canon").isNotNull() & (F.col("url_canon") != ""))
    out = (
        out.withColumn("url_hash", make_url_hash64_udf()(F.col("url_canon")))
        .withColumn("host", U.url_host(F.col("url_canon")))
        .withColumn(
            "path",
            F.coalesce(
                F.nullif(
                    F.regexp_extract(
                        "url_canon", r"^[a-z][a-z0-9+.\-]*://[^/?#]*([^?#]*)", 1
                    ),
                    F.lit(""),
                ),
                F.lit("/"),
            ),
        )
        .withColumn(
            "scheme", F.regexp_extract("url_canon", r"^([a-z][a-z0-9+.\-]*)://", 1)
        )
    )
    prio = (F.col("_priority") if priority is not None
            else F.col("depth").cast("long"))
    return (
        out.withColumnRenamed("_depth", "depth")
        .withColumn("priority", prio)
        .withColumn("wave_id", F.lit(wave_id).cast("int"))
        # a blank/whitespace-only line canonicalizes to 'https:///' with an
        # empty host — drop it here so every ingest path (seeds, streaming,
        # discovered links) is phantom-free, not just scan_plan's nonblank()
        .filter(F.col("host") != "")
        .select(*FRONTIER_COLS)
    )


class CrawlEngine:
    def __init__(
        self,
        spark: SparkSession,
        images: DataFrame,
        dns: DataFrame | None,
        robots: DataFrame | None,
        scan_cfg: ScanConfig,
        engine_cfg: EngineConfig,
        fabric_cfg: FabricConfig,
        state_dir: str | None = None,
    ):
        self.spark = spark
        self.images = images
        self.dns = dns
        self.robots = robots
        self.scan_cfg = scan_cfg
        self.engine_cfg = engine_cfg
        self.fabric_cfg = fabric_cfg
        self.store = StateStore(spark, state_dir or engine_cfg.state_dir)

    # -- cooperative stop -------------------------------------------------------
    # The reference's stop() drains in-flight requests and discards queued
    # work (scanner.py:167-175,420-428).  The wave engine's analogue: a
    # sentinel file checked (a) between stages on the driver and (b) at
    # every Arrow batch inside the fetch UDF.  A stop mid-fetch aborts the
    # staging job before its commit, so resume re-runs the wave exactly; a
    # stop after staging returns before the merges, which the resumed run
    # applies idempotently — final tables are byte-identical either way
    # (tested in tests/test_frontier.py::test_cooperative_stop_*).

    def _stop_file(self) -> str:
        import os

        return os.path.join(self.store.root, "_stop")

    def request_stop(self) -> None:
        """Ask a running crawl to drain and stop at the next safe point.
        Callable from another process: the sentinel is a file."""
        with open(self._stop_file(), "w") as f:
            f.write("stop")

    def stop_requested(self) -> bool:
        import os

        return os.path.exists(self._stop_file())

    def clear_stop(self) -> None:
        import os

        try:
            os.remove(self._stop_file())
        except FileNotFoundError:
            pass

    # -- lifecycle ------------------------------------------------------------
    def init_frontier(self, seed_urls: DataFrame, url_col: str = "raw") -> None:
        """Seeds -> frontier wave 0 (idempotent: no-op if state exists)."""
        if self.store.exists("frontier"):
            return
        frontier = urls_to_frontier(seed_urls, url_col, depth=0, wave_id=0)
        frontier = frontier.dropDuplicates(["url_hash"])
        self.store.write("frontier", frontier)

    def add_seeds(self, seed_urls: DataFrame, url_col: str = "raw") -> None:
        """MERGE new seeds into a live frontier (recrawl re-seeding: feed
        recrawl_candidates' new/stale rows here after invalidate_seen).
        Unlike init_frontier this works on existing state; already-queued
        URLs dedup away here, already-SEEN ones at the wave's seen gate."""
        fresh = urls_to_frontier(seed_urls, url_col, depth=0, wave_id=0)
        cur = self.store.read("frontier")
        if cur is None:
            self.store.write("frontier", fresh.dropDuplicates(["url_hash"]))
            return
        # deterministic cross-source dedup (same resolution as run_wave's
        # deferred-vs-discovered merge): a URL both queued and re-seeded
        # keeps the min (priority, wave_id, url_canon) row — a bare
        # dropDuplicates would pick an arbitrary one and break bit-exact
        # resume/oracle comparisons
        others = [c for c in FRONTIER_COLS if c != "url_hash"]
        merged = (
            cur.select(*FRONTIER_COLS)
            .unionByName(fresh.select(*FRONTIER_COLS))
            .groupBy("url_hash")
            .agg(F.min_by(
                F.struct(*others),
                F.struct("priority", "wave_id", "url_canon"),
            ).alias("_r"))
            .select("url_hash", *[F.col(f"_r.{c}").alias(c) for c in others])
            .select(*FRONTIER_COLS)
        )
        self.store.write("frontier", merged)

    def committed_waves(self) -> set:
        lineage = self.store.read("lineage")
        if lineage is None:
            return set()
        return {r["wave_id"] for r in lineage.select("wave_id").distinct().collect()}

    def crawl(self, max_waves: int = 10) -> DataFrame:
        """Drain the frontier (or hit max_waves); returns the results table.
        Safe to call again after a kill — committed waves are skipped, the
        in-flight wave re-runs idempotently."""
        done = self.committed_waves()
        wave = (max(done) + 1) if done else 0
        while wave < max_waves:
            if self.stop_requested():
                break
            stats = self.run_wave(wave)
            if stats.get("stopped") or stats["n_ready"] == 0:
                break
            wave += 1
        return self.store.read("results")

    # -- one wave ---------------------------------------------------------------
    def run_wave(self, wave_id: int) -> dict:
        if wave_id in self.committed_waves():
            return {"n_ready": -1, "skipped": True, "wave_id": wave_id}

        ecfg, scfg = self.engine_cfg, self.scan_cfg
        t0 = time.time()
        frontier = self.store.read("frontier")
        if frontier is None:
            raise RuntimeError("init_frontier() first")

        staging_out = f"wave{wave_id}_out"
        staging_def = f"wave{wave_id}_deferred"
        staging_meta = f"wave{wave_id}_meta"
        if not self.store.exists(staging_out):
            if self.stop_requested():
                return {"n_ready": -1, "stopped": True, "wave_id": wave_id}
            n_ready = frontier.count()
            if n_ready == 0:
                self._commit_lineage(wave_id, 0, 0, 0, 0, {}, t0)
                return {"n_ready": 0, "wave_id": wave_id}
            scheduled, deferred = self._schedule(frontier)
            # deferred + the n_ready snapshot first; staging_out is the
            # completion marker.  n_ready is snapshotted with the staging so
            # a crash AFTER the frontier overwrite below still commits the
            # lineage row of THIS wave's input, not the advanced frontier's.
            self.store.write(staging_def, deferred.select(*FRONTIER_COLS))
            self.store.write(
                staging_meta,
                self.spark.createDataFrame([(int(n_ready),)], "n_ready long"),
            )
            try:
                self.store.write(staging_out, self._fetch(scheduled, wave_id))
            except Exception:
                if self.stop_requested():
                    # in-UDF cooperative abort: staging never committed, so
                    # a resumed run re-executes this wave exactly
                    return {"n_ready": -1, "stopped": True, "wave_id": wave_id}
                raise

        if self.stop_requested():
            # staged but unmerged: the resumed run reuses the staging and
            # applies the (idempotent) merges — drain semantics without loss
            return {"n_ready": -1, "stopped": True, "wave_id": wave_id}

        meta = self.store.read(staging_meta)
        if meta is not None:
            n_ready = meta.collect()[0]["n_ready"]
        else:  # staging from an older layout/partial write: degrade to the
            n_ready = frontier.count()  # live count (metrics-only drift)
        out = self.store.read(staging_out)
        deferred = self.store.read(staging_def)

        # AIMD politeness update — STAGED before the state merge so a
        # crash-rerun replays the same (host, budget) rows instead of
        # recomputing from the already-updated state (which would halve a
        # slow host twice for one observed wave)
        staging_budgets = f"wave{wave_id}_budgets"
        if ecfg.adaptive_politeness:
            if not self.store.exists(staging_budgets):
                self.store.write(staging_budgets, aimd_host_budgets(
                    out, self.store.read("host_budgets"),
                    default_budget=ecfg.per_host_budget,
                    slow_latency_ms=ecfg.slow_latency_ms,
                    min_budget=ecfg.min_host_budget,
                ))
            self.store.merge_upsert(
                "host_budgets", self.store.read(staging_budgets), key="host")

        # trap-guard bookkeeping: this wave's fetched-URL counts per (host,
        # path-template), keyed by (host, template, wave_id) so a crash
        # re-run REPLACES the same rows (merge_upsert is replace-by-key —
        # an additive update would double-count on replay).  The per-wave
        # grain keeps the table small (distinct templates x waves, StateStore
        # compaction applies); _schedule sums it into the cumulative view.
        if ecfg.trap_max_urls is not None:
            tpl = (
                out.select(
                    "host",
                    url_path_template(F.col("url_canon")).alias("template"),
                )
                .groupBy("host", "template")
                .agg(F.count(F.lit(1)).alias("n_urls"))  # frontier rows are
                #                       unique by url_hash -> count = distinct
                .withColumn("wave_id", F.lit(wave_id))
                .withColumn("tpl_key", F.concat_ws(
                    "\x00", F.col("host"), F.col("template"),
                    F.lit(str(wave_id))))
            )
            self.store.merge_upsert("template_counts", tpl, key="tpl_key")

        # per-partition fetch lineage (north rule: partition-granular
        # metrics checkpoint next to the wave-level lineage): derived from
        # the STAGED wave output, so a crash-rerun re-derives byte-equal
        # rows and the MERGE on (wave, partition) is idempotent.  Staging
        # written by a pre-partition-lineage build lacks the column —
        # degrade to wave-level lineage only (same discipline as the
        # staging_meta fallback above) instead of wedging the resume.
        if "fetch_part" in out.columns:
            plineage = (
                out.groupBy("fetch_part")
                .agg(F.count(F.lit(1)).alias("n_rows"),
                     F.count("error_type").alias("n_errors"),
                     F.sum("latency_ms").alias("latency_ms_sum"),
                     F.max("latency_ms").alias("latency_ms_max"))
                .withColumn("wave_id", F.lit(wave_id).cast("int"))
                .withColumn("wp_key", F.concat_ws(
                    "\x00", F.lit(str(wave_id)),
                    F.col("fetch_part").cast("string")))
            )
            self.store.merge_upsert("partition_lineage", plineage,
                                    key="wp_key")
            out = out.drop("fetch_part")

        # MERGE results + seen (idempotent on url_hash); fetch_part is a
        # lineage-only column — results keep their established schema
        self.store.merge_upsert("results", out, key="url_hash")
        seen_rows = out.select(
            "url_hash", "url_canon", F.lit(wave_id).alias("first_wave")
        )
        self.store.merge_upsert("seen", seen_rows, key="url_hash")
        # OR this wave's keys into the persisted bloom index BEFORE the
        # lineage commit: a kill anywhere re-runs the wave and re-ORs, so
        # the bloom never has false negatives vs the seen table
        bloom = self._bloom()
        if bloom is not None:
            bloom.update(seen_rows)

        # frontier(k+1) = deferred + discovered (depth-capped, in-wave deduped)
        next_frontier = deferred
        if scfg.discover_links:
            discovered = (
                out.filter(F.col("discovered").isNotNull() & (F.col("depth") < ecfg.max_depth))
                .select(F.col("depth").alias("_pd"), F.explode("discovered").alias("u"))
            )
            disc_frontier = urls_to_frontier(
                discovered, "u", depth=F.col("_pd") + 1, wave_id=wave_id + 1
            )
            next_frontier = next_frontier.unionByName(disc_frontier)
        # deterministic cross-source dedup: a URL that is BOTH deferred and
        # freshly discovered keeps the shallowest (priority, wave_id,
        # url_canon) row — dropDuplicates would pick an arbitrary one and
        # break bit-exact resume/oracle comparisons
        others = [c for c in FRONTIER_COLS if c != "url_hash"]
        next_frontier = (
            next_frontier.groupBy("url_hash")
            .agg(F.min_by(
                F.struct(*others),
                F.struct("priority", "wave_id", "url_canon"),
            ).alias("_r"))
            .select("url_hash", *[F.col(f"_r.{c}").alias(c) for c in others])
            .select(*FRONTIER_COLS)
        )
        self.store.write("frontier", next_frontier)

        # one aggregation job yields both the error histogram and n_fetched
        # (sum over all groups incl. the None/ok group) — not two passes
        err_rows = out.groupBy("error_type").agg(F.count("*").alias("n")).collect()
        errs = {r["error_type"]: r["n"] for r in err_rows if r["error_type"] is not None}
        n_fetched = sum(r["n"] for r in err_rows)
        n_deferred = deferred.count()
        self._commit_lineage(wave_id, n_ready, n_fetched, n_deferred, n_fetched, errs, t0)
        # lineage row committed = wave durable; staging served its purpose
        # (idempotent re-run) and is GC'd so state-dir disk stays O(corpus),
        # not O(waves x corpus)
        for staging in (staging_out, staging_def, staging_meta,
                        staging_budgets):
            self.store.drop(staging)
        return {
            "wave_id": wave_id, "n_ready": n_ready, "n_fetched": n_fetched,
            "n_deferred": n_deferred, "errors": errs, "secs": time.time() - t0,
        }

    # -- stages -------------------------------------------------------------------
    def _bloom(self) -> "BloomIndex | CuckooIndex | None":
        """The persisted seen-filter index (name kept from when bloom was
        the only structure; ``EngineConfig.seen_filter`` picks bloom or
        cuckoo — identical probe contract, see frontier_dedup).

        Creating an index over ALREADY-POPULATED seen state (first wave
        after flipping ``seen_filter``, or after an index dir was lost)
        BACKFILLS it from the seen table in one job: a fresh filter over a
        populated table would answer 'definitely unseen' for the whole
        old corpus and re-crawl it."""
        ecfg = self.engine_cfg
        if not ecfg.use_bloom:
            return None
        if ecfg.seen_filter not in ("bloom", "cuckoo"):
            raise ValueError(
                f"EngineConfig.seen_filter must be 'bloom' or 'cuckoo', "
                f"got {ecfg.seen_filter!r}"
            )
        import os

        root = os.path.join(self.store.root, ecfg.seen_filter)
        fresh = not os.path.exists(os.path.join(root, "meta.json"))
        if ecfg.seen_filter == "cuckoo":
            idx = CuckooIndex.open_or_create(
                root,
                partitions=ecfg.partitions,
                capacity_per_part=ecfg.bloom_capacity_per_part,
            )
        else:
            idx = BloomIndex.open_or_create(
                root,
                partitions=ecfg.partitions,
                capacity_per_part=ecfg.bloom_capacity_per_part,
                bits_per_key=ecfg.bloom_bits_per_key,
            )
        if fresh:
            seen = self.store.read("seen")
            if seen is not None:
                idx.update(seen.select("url_hash"))
        return idx

    def invalidate_seen(self, stale_keys: DataFrame) -> None:
        """Recrawl invalidation: remove stale URLs from the seen state so
        the frontier re-admits them (compose with recrawl_candidates'
        ``stale`` rows).  The seen table takes an O(stale) merge-on-read
        tombstone delta either way; the filter index diverges — cuckoo
        deletes exactly the stale keys (O(stale)), bloom cannot delete and
        must REBUILD from the surviving seen table (O(seen) scan, the
        documented cost of picking bloom on a recrawling deployment).

        ``stale_keys``: any frame with a ``url_hash`` column.  Keys are
        SEMI-JOINED against the current seen table first, so deleting a
        never-seen key (recrawl 'new' rows, an overlapping stale set, or a
        crash-re-run of this method after the tombstone landed) is a
        no-op — the cuckoo contract forbids deleting what was never
        inserted (it could evict a colliding key's fingerprint and turn a
        seen URL 'definitely unseen'), and this gate is what makes the
        whole method idempotent."""
        seen = self.store.read("seen")
        if seen is None:
            return
        keys = (
            stale_keys.select("url_hash").distinct()
            .join(seen.select("url_hash"), "url_hash", "left_semi")
        )
        # persist: the keys drive the table tombstone AND the filter
        # mutation — two actions over one frame, and the semi-join's
        # result changes once the tombstone lands (same discipline as the
        # dedup eager barriers)
        keys = keys.localCheckpoint(eager=True)
        try:
            # open the index BEFORE the tombstone lands: a fresh index
            # backfills from the seen table inside _bloom(), and that
            # backfill must cover the keys we are about to delete
            idx = self._bloom()
            self.store.merge_delete("seen", keys, key="url_hash")
            if isinstance(idx, CuckooIndex):
                idx.delete(keys)
            elif idx is not None:
                import os
                import shutil

                # blooms cannot delete: rebuild from the surviving seen
                # table (the documented O(seen) cost of bloom on a
                # recrawling deployment; _bloom() backfills the fresh dir)
                shutil.rmtree(os.path.join(self.store.root, "bloom"),
                              ignore_errors=True)
                self._bloom()
        finally:
            release_local_checkpoint(keys)

    def _seen_size(self) -> int:
        """Seen-table cardinality from lineage counters (no table scan)."""
        lineage = self.store.read("lineage")
        if lineage is None:
            return 0
        return lineage.agg(F.sum("n_fetched")).collect()[0][0] or 0

    def _schedule(self, frontier: DataFrame) -> tuple:
        ecfg = self.engine_cfg
        # the frontier is unique by url_hash BY CONSTRUCTION (init_frontier
        # dedupes; next_frontier is a groupBy(url_hash) output) — a per-wave
        # dropDuplicates here would re-shuffle the whole frontier for nothing
        ready = frontier
        seen = self.store.read("seen")
        # adaptive dedup path: plain JVM anti-join until the seen table is
        # big enough that skipping its scan pays for the bloom probe
        bloom = self._bloom() if self._seen_size() >= ecfg.bloom_min_seen else None
        unseen = dedup_unseen(
            ready, seen, ecfg.partitions,
            bits_per_key=ecfg.bloom_bits_per_key, bloom=bloom,
        )
        # crawler-trap guard: templates whose CUMULATIVE fetched-URL count
        # (template_counts state, maintained by run_wave from actually
        # fetched rows) crossed the cap trickle at most trap_keep new URLs
        # into this wave; the overflow DEFERS (stays in the frontier) —
        # throttle, never blackhole.  One broadcast join + a window over
        # only the trapped subset (operators/traps.py).
        trap_overflow = None
        if ecfg.trap_max_urls is not None:
            tpl_counts = self.store.read("template_counts")
            if tpl_counts is not None:
                traps = (
                    tpl_counts.groupBy("host", "template")
                    .agg(F.sum("n_urls").alias("_n"))
                    .filter(F.col("_n") > ecfg.trap_max_urls)
                    .select("host", "template")
                )
                unseen, trap_overflow = frontier_trap_split(
                    unseen, traps, url_col="url_canon", host_col="host",
                    keep=ecfg.trap_keep,
                )
        ranked = politeness_schedule(
            unseen, self.robots, default_budget=ecfg.per_host_budget,
            pre_salt=ecfg.politeness_pre_salt,
            host_budgets=(self.store.read("host_budgets")
                          if ecfg.adaptive_politeness else None),
        )
        # sched_rank stays on the scheduled side: _fetch salts hot hosts by
        # floor((rank-1)/target) — free, perfectly balanced (politeness.py)
        scheduled = ranked.filter(F.col("scheduled")).drop("scheduled")
        deferred = ranked.filter(~F.col("scheduled")).drop("scheduled", "sched_rank")
        if trap_overflow is not None:
            deferred = deferred.select(*FRONTIER_COLS).unionByName(
                trap_overflow.select(*FRONTIER_COLS))
        if ecfg.wave_limit is not None:
            scheduled = scheduled.orderBy("priority", "url_hash").limit(ecfg.wave_limit)
        return scheduled, deferred

    def _fetch(self, scheduled: DataFrame, wave_id: int) -> DataFrame:
        ecfg, scfg = self.engine_cfg, self.scan_cfg
        # scan target = canonical URL minus the scheme (host + path + query);
        # the fetch stage re-prefixes the protocol under test
        df = scheduled.withColumn(
            "scan_target",
            F.regexp_replace(F.col("url_canon"), r"^[a-z][a-z0-9+.\-]*://", ""),
        ).withColumn("port", F.lit(None).cast("int"))
        df = df.withColumn(
            "proto_first",
            F.when(F.col("scheme") == "http", F.lit("http")).otherwise(F.lit("https")),
        ).withColumn(
            "proto_second",
            F.when(F.col("scheme") == "http", F.lit("https")).otherwise(F.lit("http")),
        )
        # image_id resolves NATIVELY from the path tail for page URLs (the
        # dominant shape); root/odd paths get NULL here and are resolved
        # inside the fetch stage's batch loop (operators/fetch.py) — this
        # keeps the wave at exactly ONE python stage.  The image_id column
        # is only the payload-lookup key: a NULL just misses the meta join
        # and the transport regenerates the record in-stage, so results are
        # identical either way (the fetch stage emits the resolved id).
        tail = F.regexp_extract(F.col("path"), r"([^/]*)$", 1)
        is_page = (~F.col("path").isin("", "/")) & tail.rlike("^img[0-9]+$")
        df = df.withColumn("image_id", F.when(is_page, tail))
        # pre-fetch join carries LIGHT metadata only (AQE broadcasts);
        # heavy bytes join post-fetch so they never ride this shuffle
        meta_names = [n for n, _t in META]
        df = df.join(self.images.select("image_id", *meta_names), "image_id", "left")

        # the slim frontier columns ride the python stage as passthrough
        # (whole-array copies in the batch loop — measured cheaper than the
        # former JVM rejoin, which shuffled the FAT fetch output rows; at
        # 100 TB the post-fetch shuffle of body-bearing rows is the one to
        # avoid).  Payload BYTES still join post-fetch only.
        passthrough = [
            ("url_hash", "long"), ("image_id", "string"),
            ("url_canon", "string"), ("host", "string"), ("path", "string"),
            ("depth", "int"), ("priority", "long"),
        ]
        pass_names = [n for n, _t in passthrough]
        pass_schema = ", ".join(f"{n} {t}" for n, t in passthrough)

        rank_col = "sched_rank" if "sched_rank" in df.columns else None
        df = salted_repartition(
            df, ecfg.partitions, ecfg.salt_buckets,
            adaptive_target=ecfg.hot_host_threshold, rank_col=rank_col,
        )
        stage = make_fetch_stage(
            scfg, self.fabric_cfg, pass_names, stop_file=self._stop_file()
        )
        fetch_in = df.select(
            *pass_names, *[n for n, _t in META],
            "scan_target", "port", "proto_first", "proto_second",
        )
        out = fetch_in.mapInPandas(stage, schema=fetch_output_schema(pass_schema))
        # partition id of the FETCH task, captured before the payload join
        # can move rows — feeds the per-partition lineage table; the value
        # lands in the staged wave output, so resume reads the recorded
        # ids instead of recomputing them
        out = out.withColumn("fetch_part", F.spark_partition_id())
        if ecfg.include_payload:
            out = out.join(
                self.images.select(
                    "image_id", *[n for n, _t in META], *[n for n, _t in PAYLOAD]
                ),
                "image_id", "left",
            )
        return out.withColumn("wave_id", F.lit(wave_id).cast("int"))

    def _commit_lineage(self, wave_id, n_ready, n_scheduled, n_deferred, n_fetched, errs, t0):
        t1 = time.time()
        row = [
            (
                int(wave_id), int(n_ready), int(n_scheduled), int(n_deferred),
                int(n_fetched), errs, float(t0), float(t1),
                float(n_fetched / (t1 - t0)) if t1 > t0 else 0.0,
            )
        ]
        schema = (
            "wave_id int, n_ready long, n_scheduled long, n_deferred long, "
            "n_fetched long, errors_by_type map<string,long>, t_start double, "
            "t_end double, urls_per_sec double"
        )
        self.store.append("lineage", self.spark.createDataFrame(row, schema))
