#!/usr/bin/env python3
"""Benchmark harness.

Default mode (what the round driver runs): time the headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` (default 32) and print ONE JSON line::

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": <sf>, "aux": {...rates...}}

Scaling mode (``--scaling``): run the identical crawl workload in fresh
subprocesses at local[8] and local[32] (same input, same JVM size) and
append the measured throughputs + efficiency to BENCH/BASELINE.md — the
sandbox evidencing of the north_rule's N->4N >=0.8 criterion (no real
cluster available; see BASELINE.md "Sandbox evidencing plan").
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# crawl-workload knobs (independent of sf_dir; the frontier is synthesized)
# sized so the fetch wave is compute-dominated, not job-overhead-dominated
CRAWL_IMAGES = int(os.environ.get("BENCH_CRAWL_IMAGES", "16000"))
CRAWL_HOSTS = int(os.environ.get("BENCH_CRAWL_HOSTS", "400"))
# URL count is decoupled from the image-table size: pages are served at any
# /d<k>/img... path, so the seed set can exceed the payload table (matches
# production: many URLs point at the same stored object)
CRAWL_URLS = int(os.environ.get("BENCH_CRAWL_URLS", str(CRAWL_IMAGES * 3)))
DEDUP_ROWS = int(os.environ.get("BENCH_DEDUP_ROWS", "4000000"))
IMAGE_ROWS = int(os.environ.get("BENCH_IMAGE_ROWS", "1000000"))


def build_spark(cpus: int):
    from httpz_spark.session import get_spark

    return get_spark(
        app_name="httpz_spark-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 16),
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.driver.memory": os.environ.get("BENCH_DRIVER_MEM", "8g"),
        },
    )


def crawl_workload(spark, cpus: int) -> dict:
    """One politeness-shaped frontier wave over a synthetic web + a
    frontier-dedup pass — the two headline rates from BASELINE.md.

    The fetch metric drives the ENGINE's frontier stages (canonicalize ->
    politeness window -> salted repartition -> mapInPandas fetch) over
    CRAWL_URLS *distinct* page URLs (distinct (host, path) per row — no
    fabric-cache artifacts), which is the north_rule's "URLs fetched/sec on
    a seeded frontier" shape.  State-table checkpointing is benchmarked by
    tests, not here: this isolates the scan throughput."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from httpz_spark.config import EngineConfig, ScanConfig
    from httpz_spark.plans.frontier import CrawlEngine
    from httpz_spark.sources import fabric as FB
    from httpz_spark.sources import synthetic as S

    world = FB.FabricConfig(n_images=CRAWL_IMAGES, n_hosts=CRAWL_HOSTS).with_certs()
    out = {}

    # distinct page URLs: /d<k>/img... paths all serve the img payload row
    page_seeds = [
        f"https://{FB.host_for_image(FB.image_id_at(i % CRAWL_IMAGES), world)}"
        f"/d{i // CRAWL_IMAGES}/{FB.image_id_at(i % CRAWL_IMAGES)}"
        for i in range(CRAWL_URLS)
    ]
    seeds = S.seeds_df(spark, page_seeds).repartition(max(cpus, 16)).persist()
    seeds.count()
    # materialize the payload table BEFORE timing: in production `images` is
    # a stored Iceberg table, not something the crawl generates per wave
    images = S.images_df(spark, world, partitions=max(cpus, 16)).persist()
    images.count()
    state = tempfile.mkdtemp(prefix="httpz_bench_state_")
    try:
        eng = CrawlEngine(
            spark, images, dns=None, robots=None,
            scan_cfg=ScanConfig.all_on(),
            engine_cfg=EngineConfig(
                partitions=max(2 * cpus, 32), per_host_budget=1 << 30,
                salt_buckets=8, use_bloom=False, include_payload=False,
            ),
            fabric_cfg=world, state_dir=state,
        )
        eng.init_frontier(seeds)
        frontier = eng.store.read("frontier").persist()
        frontier.count()
        t0 = time.time()
        scheduled, _deferred = eng._schedule(frontier)
        n_fetched = eng._fetch(scheduled, 0).count()
        dt = time.time() - t0
        frontier.unpersist()
    finally:
        shutil.rmtree(state, ignore_errors=True)
    out["fetch_wave_sec"] = dt
    out["urls_per_sec"] = n_fetched / dt
    out["n_fetched"] = n_fetched

    # -- frontier dedup ops/sec at DEDUP_ROWS scale (hash-range frontier):
    #    steady-state engine path = persisted bloom probe + exact anti-join
    #    (index prebuilt untimed — waves maintain it incrementally), with the
    #    plain JVM anti-join recorded alongside for comparison
    import shutil
    import tempfile

    from httpz_spark.operators.frontier_dedup import (
        BloomIndex,
        CuckooIndex,
        dedup_unseen,
    )

    P = max(cpus, 16)
    cand = spark.range(0, DEDUP_ROWS, 1, P).select(
        (F.xxhash64(F.col("id"))).alias("url_hash"), F.col("id").alias("payload")
    )
    seen = spark.range(DEDUP_ROWS // 2, DEDUP_ROWS + DEDUP_ROWS // 2, 1, P).select(
        F.xxhash64(F.col("id")).alias("url_hash")
    ).persist()
    seen.count()
    bloom_root = tempfile.mkdtemp(prefix="httpz_bench_bloom_")
    cuckoo_root = tempfile.mkdtemp(prefix="httpz_bench_cuckoo_")
    try:
        idx = BloomIndex.open_or_create(
            bloom_root, partitions=P, capacity_per_part=DEDUP_ROWS // P + 1
        )
        idx.update(seen)
        t0 = time.time()
        n_unseen = dedup_unseen(cand, seen, partitions=P, bloom=idx).count()
        dt = time.time() - t0
        out["dedup_sec"] = dt
        out["dedup_ops_per_sec"] = DEDUP_ROWS / dt
        out["n_unseen"] = n_unseen
        t0 = time.time()
        dedup_unseen(cand, seen, partitions=P).count()
        out["dedup_plain_sec"] = time.time() - t0
        # cuckoo path (delete-capable seen structure), same prebuilt-index
        # protocol as the bloom row
        cidx = CuckooIndex.open_or_create(
            cuckoo_root, partitions=P, capacity_per_part=DEDUP_ROWS // P + 1
        )
        cidx.update(seen)
        t0 = time.time()
        dedup_unseen(cand, seen, partitions=P, bloom=cidx).count()
        out["dedup_cuckoo_sec"] = time.time() - t0
    finally:
        shutil.rmtree(bloom_root, ignore_errors=True)
        shutil.rmtree(cuckoo_root, ignore_errors=True)
        seen.unpersist()
    seeds.unpersist()
    images.unpersist()
    return out


def detrap_workload(spark, cpus: int) -> dict:
    """Trap-guard throughput at DEDUP_ROWS frontier width: 100 hosts, two
    exploding templates (calendar + hex session ids, ~4k distinct URLs per
    host-template) and one healthy bounded template — the guard must cap
    the traps and pass the healthy 80% untouched, in one distinct-count
    agg + a trapped-subset-only window (operators/traps.py)."""
    from pyspark.sql import functions as F

    from httpz_spark.operators.traps import frontier_detrap

    P = max(cpus, 16)
    k = F.col("id")
    host = F.concat(F.lit("h"), (k % 100).cast("string"), F.lit(".test"))
    base = F.concat(F.lit("https://"), host)
    url = (
        F.when(k % 10 == 0, F.concat(
            base, F.lit("/cal/2026-"), (1 + k % 12).cast("string"),
            F.lit("-"), (1 + k % 28).cast("string"), F.lit("/ev"),
            k.cast("string")))
        .when(k % 10 == 1, F.concat(base, F.lit("/s/"), F.md5(k.cast("string"))))
        .otherwise(F.concat(base, F.lit("/li/img"), (k % 800).cast("string")))
    )
    f = spark.range(0, DEDUP_ROWS, 1, P).select(
        host.alias("host"), url.alias("url")).persist()
    f.count()
    t0 = time.time()
    n_out = frontier_detrap(f, max_urls=2000, keep=64).count()
    dt = time.time() - t0
    f.unpersist()
    return {"sec": dt, "rows_per_sec": DEDUP_ROWS / dt, "n_out": n_out}


def revalidate_workload(spark, cpus: int) -> dict:
    """Steady-state conditional recrawl wave at CRAWL_URLS width: 90% of
    candidates hold the page's current validators (-> 304, no body
    transfer/parse), 10% a stale etag (-> full refetch).  The rate to
    compare against crawl_fetch_wave — the unchanged-majority saving the
    revalidation path exists for."""
    import pandas as pd
    from pyspark.sql import functions as F

    from httpz_spark.config import ScanConfig
    from httpz_spark.operators.revalidate import revalidate_plan
    from httpz_spark.sources import fabric as FB

    world = FB.FabricConfig(
        n_images=CRAWL_IMAGES, n_hosts=CRAWL_HOSTS).with_certs()
    hosts, paths, etags, lms = [], [], [], []
    for i in range(CRAWL_URLS):
        iid = FB.image_id_at(i % CRAWL_IMAGES)
        h = FB.host_for_image(iid, world)
        p = f"/d{i // CRAWL_IMAGES}/{iid}"
        hosts.append(h)
        paths.append(p)
        if i % 10 == 0:
            etags.append('"stale"')
            lms.append(None)
        else:
            et, lm = FB.page_validators(h, p, world)
            etags.append(et)
            lms.append(lm)
    cand = spark.createDataFrame(pd.DataFrame({
        "host": hosts, "path": paths, "etag": etags, "last_modified": lms,
    })).repartition(max(cpus, 16)).persist()
    cand.count()
    cfg = ScanConfig(fetch_headers=True, fetch_title=True, retries=1)
    t0 = time.time()
    out = revalidate_plan(cand, cfg, world)
    agg = out.agg(
        F.sum(out["not_modified"].cast("int")).alias("n_304"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    dt = time.time() - t0
    cand.unpersist()
    return {"sec": dt, "urls_per_sec": CRAWL_URLS / dt,
            "n_304": int(agg["n_304"]), "n": int(agg["n"])}


def imageshard_workload(spark, cpus: int) -> dict:
    """Image-axis capstone throughput at IMAGE_ROWS payload rows (the
    graft cell's image+caption table): 5% of ids sit in 2-copy
    caption-duplicate groups, ~6% are 2-bit-pHash-flipped re-encodes of a
    neighbor, the rest unique — caption-star edges ∪ banded-hamming pHash
    pairs -> ONE connected-components pass (operators/imageshard.py).
    Random 64-bit pHashes are the WORST case for the banded join (every
    16-bit band bucket carries ~IMAGE_ROWS/2^16 colliders to verify), so
    this rate is a floor, not a best case."""
    from pyspark.sql import functions as F

    from httpz_spark.operators.imageshard import image_training_shard

    n, P = IMAGE_ROWS, max(cpus, 16)
    k = F.col("id")
    cap_key = (k - (k % 20 == 19).cast("long")).cast("string")
    ph_src = (k - (k % 16 == 1).cast("long")).cast("string")
    base_ph = F.xxhash64(F.concat(F.lit("ph:"), ph_src))
    bit = F.array(*[F.lit(1 << i if i < 63 else -(1 << 63)).cast("long")
                    for i in range(64)])
    b1 = F.pmod(F.xxhash64(F.concat(F.lit("f1:"), k.cast("string"))), F.lit(64))
    b2 = F.pmod(F.xxhash64(F.concat(F.lit("f2:"), k.cast("string"))), F.lit(64))
    mask = F.element_at(bit, (b1 + 1).cast("int")).bitwiseXOR(
        F.element_at(bit, (b2 + 1).cast("int")))
    imgs = spark.range(0, n, 1, P).select(
        F.concat(F.lit("img"), k.cast("string")).alias("image_id"),
        F.concat(F.lit("caption text "), cap_key).alias("caption"),
        F.when(k % 16 == 1, base_ph.bitwiseXOR(mask))
         .otherwise(base_ph).alias("phash"),
    ).persist()
    imgs.count()
    t0 = time.time()
    n_out = image_training_shard(imgs).count()
    dt = time.time() - t0
    imgs.unpersist()
    return {"sec": dt, "rows_per_sec": n / dt, "n_out": n_out}


def ann_10k_queries(spark) -> dict:
    """PQ-ADC top-k at Q = 10^4 (corpus-vs-corpus retrieval shape) — the
    round-5 verdict's large-Q bench point.  Q > q_max auto-dispatches to
    the DISTRIBUTED path (broadcast query matrix, per-task numpy LUTs,
    task-local top-k pre-reduction); the driver path at this Q would build
    10^4 pure-python LUTs (~10^8 float ops) in the closure.  Queries are
    the corpus replicated with fresh ids — content repetition is fine,
    the cost driver is Q itself.  Index build (train + encode) is
    UNTIMED: that's the build-once half of the persisted-index split."""
    from pyspark.sql import functions as F

    from httpz_spark.operators import similarity as SIM

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cb = SIM.train_pq_codebooks(emb, m=8, kc=256)
    codes = SIM.pq_encode(emb, cb).persist()
    codes.count()
    n = emb.count()
    reps = (10_000 + n - 1) // n
    q = (
        emb.select("vec_id", "embedding")
        .crossJoin(spark.range(reps).select(F.col("id").alias("_r")))
        .select((F.col("vec_id") + F.col("_r") * n).alias("query_id"),
                "embedding")
        .filter(F.col("query_id") < 10_000)
        .persist()
    )
    nq = q.count()
    t0 = time.time()
    SIM.pq_adc_topk(codes, cb, q, k=3).write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    codes.unpersist()
    q.unpersist()
    return {"sec": dt, "n_queries": nq, "queries_per_sec": nq / dt}


def warc_workload(spark, n: int = 500_000, n_files: int = 64) -> dict:
    """Archive sink/source throughput: write n synthetic captures as
    record-at-time-gzip WARC (the CDX index materializes the write),
    then read the archive back.  Bodies are ~270 high-entropy bytes so
    gzip cannot flatten the workload."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from httpz_spark.sources.warc import read_warc, write_warc

    path = tempfile.mkdtemp(prefix="bench_warc_")
    try:
        src = spark.range(n).select(
            F.concat(F.lit("https://h"), (F.col("id") % 997).cast("string"),
                     F.lit(".example/p/"), F.col("id").cast("string")
                     ).alias("url"),
            F.lit("2026-01-01T00:00:00Z").alias("date"),
            F.lit(200).alias("status"),
            F.lit("text/html").alias("content_type"),
            F.encode(F.concat(
                F.md5(F.col("id").cast("string")),
                F.sha2(F.col("id").cast("string"), 256),
                F.sha2((F.col("id") + n).cast("string"), 512)),
                "UTF-8").alias("body"),
        )
        t0 = time.time()
        n_cdx = write_warc(src, path, n_files=n_files).count()
        w = time.time() - t0
        t0 = time.time()
        n_back = read_warc(spark, path).count()
        r = time.time() - t0
        assert n_cdx == n_back == n
        return {"write_sec": w, "read_sec": r,
                "write_rps": n / w, "read_rps": n / r}
    finally:
        shutil.rmtree(path, ignore_errors=True)


def _load1() -> float:
    """1-minute load average — the ambient-tenancy bracket.  This host is a
    shared VM whose steal swings minute to minute; BENCH_r04 was captured
    in a loaded minute and manufactured a phantom +16-64% regression across
    even untouched queries (round-4 verdict #1), so every gate number now
    carries its own brackets."""
    return round(os.getloadavg()[0], 2)


def table_queries(spark) -> tuple:
    """Headline driver-table queries (the __spark_entry__ contract set that
    stresses distinct physical shapes: window, anti-join, broadcast-agg,
    shingle-join, vector math).  Returns (times, per-query load brackets)."""
    import __spark_entry__ as E

    names = [
        "lineage_agg", "politeness_topk", "seen_antijoin",
        "robots_broadcast_join", "sorted_distinct_agg", "exact_dedup",
        "text_stats", "ngram_jaccard_dups", "minhash_lsh_dups",
        "cosine_topk", "url_canonicalize", "shard_filter",
        "training_shard", "winnow_fingerprints", "pq_ann_topk",
        "pq_ann_topk_256", "gopher_quality",
        # round-6 curation stages (regex map / window-group-limit shuffle /
        # per-shard cumsum / map-only gate battery), the C4 battery, and
        # the end-to-end curated capstone
        "pii_scrub", "domain_mix", "seq_pack", "image_pair_filter",
        "c4_clean", "training_shard_curated", "corpus_report",
        # round-6 session 5: cuckoo seen path + recrawl invalidation +
        # pre-fetch URL rules
        "seen_antijoin_cuckoo", "recrawl_invalidate", "url_quality",
        # round-6 session 6: DSIR importance weights (hashed-gram explode
        # + broadcast LLR join + map-side-combined doc agg) and
        # ExactSubstr span removal (window explode + count-then-join +
        # islands merge + native text rebuild)
        "dsir_weights", "exactsubstr", "bm25",
        # round-6 session 7: WARC framing + revisit collapse (native
        # binary concat + one (surt, digest) window)
        "warc_revisit",
    ]
    qs = E.queries()
    times, loads = {}, {}
    for name in names:
        l0 = _load1()
        t0 = time.time()
        qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        times[name] = round(time.time() - t0, 3)
        loads[name] = [l0, _load1()]
    return times, loads


def run_default() -> None:
    spark = build_spark(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    queries, qloads = {}, {}
    load_start = _load1()
    t_all = time.time()

    l0 = _load1()
    crawl = crawl_workload(spark, CPUS)
    l1 = _load1()
    queries["crawl_fetch_wave"] = round(crawl["fetch_wave_sec"], 3)
    queries["frontier_dedup"] = round(crawl["dedup_sec"], 3)
    queries["frontier_dedup_cuckoo"] = round(crawl["dedup_cuckoo_sec"], 3)
    qloads["crawl_fetch_wave"] = qloads["frontier_dedup"] = [l0, l1]
    qloads["frontier_dedup_cuckoo"] = [l0, l1]
    tq, tl = table_queries(spark)
    queries.update(tq)
    qloads.update(tl)
    l0 = _load1()
    ann = ann_10k_queries(spark)
    queries["pq_adc_topk_10kq"] = round(ann["sec"], 3)
    qloads["pq_adc_topk_10kq"] = [l0, _load1()]
    l0 = _load1()
    detrap = detrap_workload(spark, CPUS)
    queries["frontier_detrap_4m"] = round(detrap["sec"], 3)
    qloads["frontier_detrap_4m"] = [l0, _load1()]
    l0 = _load1()
    reval = revalidate_workload(spark, CPUS)
    queries["revalidate_wave"] = round(reval["sec"], 3)
    qloads["revalidate_wave"] = [l0, _load1()]
    l0 = _load1()
    ishard = imageshard_workload(spark, CPUS)
    queries["image_shard_1m"] = round(ishard["sec"], 3)
    qloads["image_shard_1m"] = [l0, _load1()]
    l0 = _load1()
    warc = warc_workload(spark)
    queries["warc_write_500k"] = round(warc["write_sec"], 3)
    queries["warc_read_500k"] = round(warc["read_sec"], 3)
    qloads["warc_write_500k"] = qloads["warc_read_500k"] = [l0, _load1()]
    total = round(time.time() - t_all, 3)
    # same-minute machine ceiling (multiprocessing, no Spark): what this
    # host could deliver for the fetch workload DURING this capture —
    # lets a reader separate engine deltas from tenant load
    # (the bench_ab_frontier discipline, adopted into the gate artifact)
    spark.stop()
    ceil = _level_ceiling(CPUS, per=1500)

    print(json.dumps({
        "metric": "httpz_spark headline suite (crawl wave + frontier dedup + contract queries)",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "aux": {
            "urls_per_sec": round(crawl["urls_per_sec"], 1),
            "n_fetched": crawl["n_fetched"],
            "dedup_ops_per_sec": round(crawl["dedup_ops_per_sec"], 1),
            "ann_10kq_per_sec": round(ann["queries_per_sec"], 1),
            "detrap_rows_per_sec": round(detrap["rows_per_sec"], 1),
            "reval_urls_per_sec": round(reval["urls_per_sec"], 1),
            "reval_n_304": reval["n_304"],
            "cpus": CPUS,
        },
        "load": {
            "load_1min_start": load_start,
            "load_1min_end": _load1(),
            "per_query_1min": qloads,
            "post_suite_ceiling_urls_per_sec": round(ceil, 0),
            "note": ("1-min load avg bracketing each query (shared-VM "
                     "tenancy context); ceiling = same-workload "
                     "multiprocessing throughput measured right after the "
                     "suite on this host"),
        },
    }))


def _mp_fetch_work(args):
    """One process's share of the ceiling probe: run the REAL fetch stage
    function on a locally-built batch (no Spark) — measures what this
    machine can possibly deliver for this exact workload."""
    lo, hi = args
    import pandas as pd

    from httpz_spark.config import ScanConfig
    from httpz_spark.operators.fetch import make_fetch_stage
    from httpz_spark.sources import fabric as FB

    world = FB.FabricConfig(n_images=CRAWL_IMAGES, n_hosts=CRAWL_HOSTS).with_certs()
    rows = []
    for i in range(lo, hi):
        iid = FB.image_id_at(i % CRAWL_IMAGES)
        host = FB.host_for_image(iid, world)
        w, h, fmt = FB.image_meta(iid, world)
        rows.append({
            "url_hash": i, "image_id": iid, "w": w, "h": h, "fmt": fmt,
            "caption": FB.caption_for(iid, world),
            "scan_target": f"{host}/d0/{iid}", "port": None,
            "proto_first": "https", "proto_second": "http",
        })
    pdf = pd.DataFrame(rows)
    stage = make_fetch_stage(ScanConfig.all_on(), world, ["url_hash", "image_id"])
    t0 = time.time()
    list(stage(iter([pdf])))
    return hi - lo, time.time() - t0


def cpu_ceiling_probe() -> dict:
    """Multiprocessing throughput of the EXACT fetch workload (no Spark) at
    each parallelism level — the machine's real ceiling for this job.  This
    sandbox is a shared VM (hypervisor steal; load avg fluctuates): the
    ceiling brackets what any engine on this host can achieve, so Spark's
    efficiency is read against it."""
    import multiprocessing as mp

    per = 4000
    out = {}
    for procs in (4, 8, 16, 32):
        with mp.Pool(procs) as p:
            p.map(_mp_fetch_work, [(0, 300)] * procs)  # warm imports/caches
            best = 0.0
            for _ in range(2):
                t0 = time.time()
                p.map(_mp_fetch_work, [(k * per, (k + 1) * per) for k in range(procs)])
                best = max(best, procs * per / (time.time() - t0))
        out[procs] = best
    out["eff_4_to_16"] = (out[16] / out[4]) / 4
    out["eff_8_to_32"] = (out[32] / out[8]) / 4
    return out


def _level_ceiling(cpus: int, per: int = 3000) -> float:
    """Same-workload multiprocessing ceiling at THIS level, measured in the
    same subprocess/minute as the Spark runs — on a shared VM the ambient
    steal changes minute to minute, so each level's Spark number must be
    read against a ceiling taken under the same load."""
    import multiprocessing as mp

    with mp.Pool(cpus) as p:
        p.map(_mp_fetch_work, [(0, 300)] * cpus)  # warm imports/caches
        best = 0.0
        for _ in range(2):
            t0 = time.time()
            p.map(_mp_fetch_work, [(k * per, (k + 1) * per) for k in range(cpus)])
            best = max(best, cpus * per / (time.time() - t0))
    return best


def run_probe(cpus: int, reps: int = 3) -> None:
    """Subprocess entry for --scaling: crawl workload, warm-up + best-of-N
    (best-of de-noises hypervisor steal on this shared VM), plus the
    same-load machine ceiling for normalization."""
    spark = build_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    crawl_workload(spark, cpus)  # warm-up (JIT, codegen, python workers)
    best = None
    for _ in range(reps):
        out = crawl_workload(spark, cpus)
        if best is None or out["urls_per_sec"] > best["urls_per_sec"]:
            best = {**out}
        best["dedup_ops_per_sec"] = max(best["dedup_ops_per_sec"], out["dedup_ops_per_sec"])
        best["dedup_sec"] = min(best["dedup_sec"], out["dedup_sec"])
        best["dedup_plain_sec"] = min(best["dedup_plain_sec"], out["dedup_plain_sec"])
        best["dedup_cuckoo_sec"] = min(best["dedup_cuckoo_sec"], out["dedup_cuckoo_sec"])
    best["cpus"] = cpus
    spark.stop()
    best["ceiling_urls_per_sec"] = _level_ceiling(cpus)
    print("PROBE_JSON:" + json.dumps(best))


def run_scaling() -> None:
    """Same job, same input, at N and 4N cores — two pairs: (4,16), (8,32).
    Efficiency >= 0.8 target, read against the shared-VM CPU ceiling.
    The scaling workload is larger than the default-mode one so compute
    dominates fixed job overhead (512k URLs unless overridden)."""
    scale_env = {
        "BENCH_CRAWL_URLS": os.environ.get("BENCH_CRAWL_URLS", "512000"),
        "BENCH_DEDUP_ROWS": os.environ.get("BENCH_DEDUP_ROWS", "8000000"),
    }
    os.environ.update(scale_env)  # ceiling probe sees the same sizes
    global CRAWL_URLS, DEDUP_ROWS
    CRAWL_URLS = int(scale_env["BENCH_CRAWL_URLS"])
    DEDUP_ROWS = int(scale_env["BENCH_DEDUP_ROWS"])
    ceiling = cpu_ceiling_probe()
    results = {}
    for cpus in (4, 8, 16, 32):
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--probe", str(cpus)],
            capture_output=True, text=True,
            env={**os.environ, "SPARK_GRAFT_CPUS": str(cpus), **scale_env},
        )
        line = [ln for ln in p.stdout.splitlines() if ln.startswith("PROBE_JSON:")]
        if not line:
            print(p.stdout[-3000:], p.stderr[-3000:], file=sys.stderr)
            raise SystemExit(f"probe at local[{cpus}] failed")
        results[cpus] = json.loads(line[-1][len("PROBE_JSON:"):])

    def eff(hi, lo, key, invert=False):
        a, b = results[hi][key], results[lo][key]
        return round((b / a if invert else a / b) / 4, 3)

    pairs = {}
    for n in (4, 8):
        pairs[f"{n}_to_{4 * n}"] = {
            "fetch": eff(4 * n, n, "urls_per_sec"),
            "dedup_plain": eff(4 * n, n, "dedup_plain_sec", invert=True),
            "dedup_bloom": eff(4 * n, n, "dedup_ops_per_sec"),
            "dedup_cuckoo": eff(4 * n, n, "dedup_cuckoo_sec", invert=True),
        }
    util = {
        c: results[c]["urls_per_sec"] / results[c]["ceiling_urls_per_sec"]
        for c in (4, 8, 16, 32)
    }
    norm_pairs = {
        f"{n}_to_{4 * n}": round(util[4 * n] / util[n], 3) for n in (4, 8)
    }
    report = {
        "levels": results,
        "efficiency": pairs,
        "machine_fetch_ceiling_urls_per_sec": {
            str(c): round(ceiling[c], 0) for c in (4, 8, 16, 32)
        },
        "machine_ceiling_eff": {
            "4_to_16": round(ceiling["eff_4_to_16"], 3),
            "8_to_32": round(ceiling["eff_8_to_32"], 3),
        },
        "same_load_ceiling_urls_per_sec": {
            str(c): round(results[c]["ceiling_urls_per_sec"], 0) for c in (4, 8, 16, 32)
        },
        "spark_vs_same_load_ceiling": {str(c): round(util[c], 3) for c in (4, 8, 16, 32)},
        "normalized_efficiency": norm_pairs,
    }
    print(json.dumps(report, indent=2))

    os.makedirs("BENCH", exist_ok=True)
    rows = []
    # mode: "rate" keys hold ops/sec directly; "per_row" keys hold seconds
    # for DEDUP_ROWS rows and render as DEDUP_ROWS/sec
    for metric, key, mode in (
        ("URLs fetched/sec", "urls_per_sec", "rate"),
        ("frontier-dedup ops/sec (plain JVM anti-join — engine default at this seen ratio)",
         "dedup_plain_sec", "per_row"),
        ("frontier-dedup ops/sec (persisted-bloom path)", "dedup_ops_per_sec", "rate"),
        ("frontier-dedup ops/sec (persisted-cuckoo path — delete-capable)",
         "dedup_cuckoo_sec", "per_row"),
    ):
        if mode == "per_row":
            vals = [DEDUP_ROWS / results[c][key] for c in (4, 8, 16, 32)]
        else:
            vals = [results[c][key] for c in (4, 8, 16, 32)]
        e416 = round((vals[2] / vals[0]) / 4, 3)
        e832 = round((vals[3] / vals[1]) / 4, 3)
        rows.append(
            f"| {metric} | " + " | ".join(f"{v:,.0f}" for v in vals)
            + f" | {e416:.3f} | {e832:.3f} |"
        )
    ceil_row = (
        "| machine fetch ceiling (same workload, multiprocessing, no Spark) | "
        + " | ".join(f"{ceiling[c]:,.0f}" for c in (4, 8, 16, 32))
        + f" | {ceiling['eff_4_to_16']:.3f} | {ceiling['eff_8_to_32']:.3f} |"
    )
    slc = {c: results[c]["ceiling_urls_per_sec"] for c in (4, 8, 16, 32)}
    ceil_row += (
        "\n| same-load ceiling (measured in each level's own probe minute) | "
        + " | ".join(f"{slc[c]:,.0f}" for c in (4, 8, 16, 32))
        + f" | {(slc[16] / slc[4]) / 4:.3f} | {(slc[32] / slc[8]) / 4:.3f} |"
    )
    ne = report["normalized_efficiency"]
    ceil_row += (
        "\n| **URLs fetched/sec, load-normalized (spark÷same-load-ceiling)** | "
        + " | ".join(f"{util[c]:.1%}" for c in (4, 8, 16, 32))
        + f" | **{ne['4_to_16']:.3f}** | **{ne['8_to_32']:.3f}** |"
    )
    vs = report["spark_vs_same_load_ceiling"]
    # preserve addendum sections (wave-size tables, variance notes) across
    # rewrites of the headline table
    addendum = ""
    try:
        with open("BENCH/BASELINE.md") as f:
            old = f.read()
        if "\n## " in old:
            addendum = "\n## " + old.split("\n## ", 1)[1]
    except FileNotFoundError:
        pass
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(
            "# BENCH/BASELINE — measured throughput + N->4N scaling evidence\n\n"
            "No real cluster is available in this sandbox; per BASELINE.md's\n"
            "evidencing plan, the SAME crawl job ran on the SAME input at four\n"
            "parallelism levels (fresh JVM subprocess per level, one warm-up run,\n"
            "then best-of-3 measured runs to de-noise hypervisor steal).\n\n"
            f"Workload: one politeness-shaped frontier wave (canonicalize -> dedup\n"
            f"-> politeness window -> salted repartition -> mapInPandas fetch) over\n"
            f"{CRAWL_URLS:,} DISTINCT page URLs serving a {CRAWL_IMAGES:,}-image payload\n"
            f"table across {CRAWL_HOSTS} hosts (ALL feature toggles on: headers, title,\n"
            f"body preview/clean, favicon second-fetch, TLS parse), plus frontier\n"
            f"dedup over {DEDUP_ROWS:,} hash-range frontier rows vs an equal-size\n"
            "seen set (both dedup paths measured).\n\n"
            "| metric | local[4] | local[8] | local[16] | local[32] | eff 4->16 | eff 8->32 |\n"
            "|---|---|---|---|---|---|---|\n"
            + "\n".join(rows) + "\n"
            + ceil_row + "\n\n"
            "Machine context: shared Firecracker VM with hypervisor steal that\n"
            "varies minute to minute (ambient load avg swings 2-12 from other\n"
            "tenants).  The ceiling rows run the IDENTICAL fetch-stage function\n"
            "via plain multiprocessing (no Spark, no shuffle, no scheduler): the\n"
            "maximum ANY engine could deliver on this host; the same-load ceiling\n"
            "is taken inside each level's own probe minute, so the load-normalized\n"
            "row (Spark ÷ same-load ceiling) isolates ENGINE-attributable scaling\n"
            "from tenancy noise.  Spark-vs-same-load-ceiling utilization: "
            f"{', '.join(f'local[{c}] {float(vs[str(c)]):.0%}' for c in (4, 8, 16, 32))}.\n\n"
            f"Raw: `{json.dumps(report)}`\n"
            + addendum
        )
    print("wrote BENCH/BASELINE.md")


def run_wavesize(cpus: int = 32) -> None:
    """Wave-size sensitivity at full width: per-wave costs (schedule,
    shuffle barriers, Arrow setup) amortize as waves grow — the regime a
    10^10-URL frontier actually runs in.  Appends results to
    BENCH/BASELINE.md."""
    import shutil
    import tempfile

    from httpz_spark.config import EngineConfig, ScanConfig
    from httpz_spark.plans.frontier import CrawlEngine
    from httpz_spark.sources import fabric as FB
    from httpz_spark.sources import synthetic as S

    spark = build_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    world = FB.FabricConfig(n_images=CRAWL_IMAGES, n_hosts=CRAWL_HOSTS).with_certs()
    images = S.images_df(spark, world, partitions=cpus).persist()
    images.count()
    results = {}
    sizes = tuple(
        int(s) for s in os.environ.get(
            "BENCH_WAVE_SIZES", "512000,1000000,2000000"
        ).split(",")
    )
    for n in sizes:
        page_seeds = [
            f"https://{FB.host_for_image(FB.image_id_at(i % CRAWL_IMAGES), world)}"
            f"/d{i // CRAWL_IMAGES}/{FB.image_id_at(i % CRAWL_IMAGES)}"
            for i in range(n)
        ]
        seeds = S.seeds_df(spark, page_seeds).repartition(cpus).persist()
        seeds.count()
        state = tempfile.mkdtemp(prefix="httpz_ws_")
        try:
            eng = CrawlEngine(
                spark, images, None, None, ScanConfig.all_on(),
                EngineConfig(partitions=2 * cpus, per_host_budget=1 << 30,
                             salt_buckets=8, use_bloom=False,
                             include_payload=False),
                world, state_dir=state,
            )
            eng.init_frontier(seeds)
            frontier = eng.store.read("frontier").persist()
            frontier.count()
            best = 0.0
            for _ in range(2):
                t0 = time.time()
                sched, _d = eng._schedule(frontier)
                got = eng._fetch(sched, 0).count()
                best = max(best, got / (time.time() - t0))
            results[n] = best
            frontier.unpersist()
        finally:
            seeds.unpersist()
            shutil.rmtree(state, ignore_errors=True)
    spark.stop()
    ceiling = _level_ceiling(cpus)
    lines = [
        f"\n## Wave-size sensitivity at local[{cpus}] (--wavesize)\n\n"
        "Per-wave fixed costs (scheduling stages, shuffle barriers, Arrow\n"
        "setup) amortize as waves grow — the regime a 10^10-URL frontier\n"
        "runs in (per-wave URL counts in the millions):\n\n"
        "| wave size | URLs/sec | % of same-minute machine ceiling "
        f"({ceiling:,.0f}/s) |\n|---|---|---|\n"
    ]
    for n, thr in results.items():
        lines.append(f"| {n:,} | {thr:,.0f} | {thr / ceiling:.0%} |\n")
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "a") as f:
        f.writelines(lines)
    print(json.dumps({str(k): round(v) for k, v in results.items()}))
    print("appended to BENCH/BASELINE.md")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--scaling":
        run_scaling()
    elif len(sys.argv) > 1 and sys.argv[1] == "--probe":
        run_probe(int(sys.argv[2]))
    elif len(sys.argv) > 1 and sys.argv[1] == "--wavesize":
        run_wavesize(int(sys.argv[2]) if len(sys.argv) > 2 else 32)
    else:
        run_default()
