"""WARC archive IO — the crawl-tier sink/source pair (Common Crawl's
interchange format, ISO 28500).

* :func:`write_warc` — distributed archive writer: records are
  hash-assigned to WARC files, each file's rows land in one partition
  (repartition on the file key) pre-sorted in CDX order, and the Arrow
  stage streams them to ``<file>.warc[.gz]`` on the executor while
  emitting the CDX index rows (surt, offset, length, digest) for the
  bytes it ACTUALLY wrote — index and archive cannot drift because they
  are produced by the same pass.  ``.gz`` files use one gzip member per
  record (the WARC-spec record-at-time compression), so a CDX offset is
  directly seekable.
* :func:`read_warc` — archive source: ``binaryFile`` scan (one task per
  WARC file — exactly how Common Crawl jobs parallelize) + an Arrow
  stage running a clean-room ISO 28500 parser (header block,
  Content-Length-framed payload, CRLF CRLF trailer; HTTP head split out
  of ``application/http`` payloads).

Scale shape: no driver state, no collect; a 100k-file archive is 100k
independent write/read tasks.  Writes target a shared filesystem path
(the local analogue of the HDFS/S3 sink a cluster deployment would use).

Determinism: gzip members are written with mtime=0 and fixed compression
level, and record framing is fully hash-derived (functions/warcx.py), so
a retried task overwrites its file byte-identically (os.replace keeps
the swap atomic).
"""

from __future__ import annotations

import gzip
import os
import zlib
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from httpz_spark.functions.hashing import hash_partition_remap
from httpz_spark.functions.warcx import (mark_revisits, surt_key,
                                         warc_conversion_record,
                                         warc_metadata_record, warc_record,
                                         warc_record_auto)

# direct-routing cap: the murmur-inverse lookup rides the plan as an
# n_files-element literal array; past this it degrades the plan more than
# the saved sampling job is worth and range partitioning takes over
_REMAP_MAX = 4096

CDX_SCHEMA = (
    "surt string, url string, date string, status int, mime string, "
    "digest string, warc_file string, offset long, length long, "
    "record_length long"
)

READ_SCHEMA = (
    "warc_file string, offset long, record_id string, warc_type string, "
    "date string, target_uri string, payload_digest string, "
    "refers_to string, http_status int, http_content_type string, "
    "body binary, record_length long"
)

#: gzip member header: magic, CM=deflate, FLG=0, MTIME=0, XFL=0, OS=unknown —
#: the exact bytes GzipFile(compresslevel=6, mtime=0) writes.
_GZ_HDR = b"\x1f\x8b\x08\x00\x00\x00\x00\x00\x00\xff"


def _gzip_member(raw: bytes, level: int = 6) -> bytes:
    """One standalone gzip member for ``raw`` — what the record-at-a-time
    archive writer emits so CDX offsets seek directly.  Hand-framed
    instead of a ``gzip.GzipFile`` per record: the file-object machinery
    plus zlib's default 256 KB workspace allocation per member dominated
    the write stage at archive scale (measured 60 → 19 µs/record;
    ``memLevel=1`` shrinks the deflate hash workspace, which for
    record-sized payloads changes compression ratio negligibly while
    tripling member throughput).  Deterministic for fixed input — a
    retried task rewrites byte-identical files, preserving the
    exactly-once os.replace contract."""
    import struct
    import zlib

    co = zlib.compressobj(level, zlib.DEFLATED, -zlib.MAX_WBITS, 1, 0)
    return (_GZ_HDR + co.compress(raw) + co.flush()
            + struct.pack("<II", zlib.crc32(raw) & 0xFFFFFFFF,
                          len(raw) & 0xFFFFFFFF))


def warc_file_assign(url_col, n_files: int, prefix: str = "part"):
    """Deterministic file assignment: ``part-00007`` style, hash of the
    url — partitioning-independent, so resume re-derives the same
    layout."""
    shard = F.pmod(F.xxhash64(url_col), F.lit(n_files))
    return F.concat(F.lit(prefix + "-"), F.lpad(shard.cast("string"), 5, "0"))


def write_warc(df: DataFrame, path: str, n_files: int = 8,
               compress: bool = True, url_col: str = "url",
               date_col: str = "date", status_col: str = "status",
               content_type_col: str = "content_type",
               body_col: str = "body", revisits: bool = False) -> DataFrame:
    """Write ``df`` as a WARC archive under ``path``; RETURNS the CDX
    index frame (lazy — the files are written when the returned frame is
    acted on; persist/write it immediately, once).

    Input needs (url, date, status, content_type, body:binary); anything
    else is ignored.  One gzip member per record when ``compress`` so
    CDX offsets seek directly; ``compress=False`` writes plain ``.warc``
    where offsets equal the uncompressed cumsum (the
    :func:`httpz_spark.functions.warcx.cdx_offsets` expression form —
    tested equal).

    ``revisits=True`` enables archive-level recrawl dedup: captures
    whose payload digest repeats an earlier capture of the same SURT key
    (:func:`httpz_spark.functions.warcx.mark_revisits` — one window on
    (surt, digest)) are written as lightweight header-only ``revisit``
    records referencing the original's record id, so unchanged bodies
    are stored once per key across recrawl epochs."""
    ext = ".warc.gz" if compress else ".warc"

    base = df.select(
        surt_key(F.col(url_col)).alias("surt"),
        F.col(url_col).alias("url"),
        F.col(date_col).alias("date"),
        F.col(status_col).cast("int").alias("status"),
        F.col(content_type_col).alias("mime"),
        F.md5(F.coalesce(F.col(body_col), F.lit(b""))).alias("digest"),
        warc_file_assign(F.col(url_col), n_files).alias("warc_file"),
        F.col(body_col).alias("_body"),
    )
    if revisits:
        base = mark_revisits(base)
        record = warc_record_auto(
            F.col("url"), F.col("date"), F.col("status"), F.col("mime"),
            F.col("_body"), F.col("revisit_of_url"),
            F.col("revisit_of_date"))
        src_cols = ["_body", "revisit_of_url", "revisit_of_date"]
    else:
        record = warc_record(F.col("url"), F.col("date"), F.col("status"),
                             F.col("mime"), F.col("_body"))
        src_cols = ["_body"]
    # expression form: the exchange moves the raw body, framing happens
    # in the writer stage below the shuffle (see write_records)
    rec = base.select("surt", "url", "date", "status", "mime", "digest",
                      "warc_file", *src_cols)
    return write_records(rec, path, n_files=n_files, compress=compress,
                         ext=ext, record=record)


def write_records(rec: DataFrame, path: str, n_files: int,
                  compress: bool, ext: str,
                  record=None) -> DataFrame:
    """Shared archive-writer tail: rows are co-located per file, laid
    out in CDX order, and streamed to disk by one Arrow stage that emits
    the index rows for the bytes it actually wrote.

    ``rec`` carries the CDX key columns (surt, url, date, status, mime,
    digest, warc_file) plus EITHER pre-framed BINARY ``record`` bytes,
    or — when the ``record`` column EXPRESSION is passed — the framing
    expression's raw source columns.  The expression form frames AFTER
    the per-file repartition, so the exchange moves the raw payload
    instead of payload+headers-framed-again bytes (~30% fewer shuffle
    bytes at WARC shapes: url/date/mime already ride the exchange as key
    columns and the framed record duplicated all of them plus the
    body)."""
    os.makedirs(path, exist_ok=True)
    keys = ["surt", "url", "date", "status", "mime", "digest", "warc_file"]
    if record is None:
        rec = rec.select(*keys, "record")
    # all rows of one file in one partition, contiguous in CDX order;
    # (date, digest) break ties when one URL has several captures
    # (multi-epoch/revisit archives) so the layout is a TOTAL order —
    # a retried/speculative task re-sorts identically and os.replace
    # swaps in byte-identical files.  Routing: warc_file has EXACTLY
    # n_files distinct values, so a naive pmod(hash(v), n_files) leaves
    # ~1/e of tasks empty while piling 2-3 files onto others (the
    # too-few-distinct-keys skew class), and repartitionByRange fixes
    # the balance but runs a range-SAMPLING job that re-evaluates the
    # whole upstream once more (payload digests, SURT keys — or an
    # entire fetched wave when the caller's frame is lazy).  Instead the
    # file index (the digits warc_file_assign puts in the name) is
    # remapped through a driver-solved murmur-inverse table so a plain
    # hash repartition sends file i to partition i exactly: one-task-per
    # -file balance, ZERO extra jobs.  File CONTENT is placement-
    # independent (equal keys stay co-located and the per-file byte
    # layout comes from the total sort order), so a non-standard
    # warc_file name — no trailing digits, an index beyond n_files —
    # falls back to hashing the name itself: still correct, just
    # hash-balanced.  Beyond _REMAP_MAX files the literal lookup array
    # stops being a sane expression and range partitioning returns.
    if n_files <= _REMAP_MAX:
        remap = hash_partition_remap(n_files)
        idx = F.regexp_extract(F.col("warc_file"), "([0-9]+)$", 1)
        idx = F.when(idx != "", idx.cast("long")).otherwise(
            F.pmod(F.xxhash64(F.col("warc_file")), F.lit(n_files)))
        route = F.element_at(
            F.array(*[F.lit(int(v)) for v in remap]),
            (F.pmod(idx, F.lit(n_files)) + 1).cast("int"))
        rec = rec.repartition(n_files, route.alias("_route"))
    else:
        rec = rec.repartitionByRange(n_files, "warc_file")
    rec = rec.sortWithinPartitions("warc_file", "surt", "url", "date",
                                   "digest")
    if record is not None:
        # map-side framing below the exchange's consumer: a projection
        # preserves the sort order and partitioning established above
        rec = rec.select(*keys, record.alias("record"))

    def _write(batches):
        import pyarrow as pa
        from pyspark import TaskContext

        # attempt-unique temp suffix: concurrent attempts of one partition
        # (speculative execution, a zombie task on a shared FS) must not
        # interleave writes into one temp file — each attempt writes its
        # own and the last completed os.replace wins atomically (the
        # rewrite is byte-identical by the total sort order)
        tc = TaskContext.get()
        tmp_sfx = f".inprogress-{tc.taskAttemptId()}" if tc else ".inprogress"
        cur_name, cur_f, out_rows = None, None, []

        def flush():
            if cur_name is None:
                return
            cur_f.close()
            final = os.path.join(path, cur_name + ext)
            os.replace(final + tmp_sfx, final)

        for rb in batches:
            cols = {n: rb.column(i).to_pylist()
                    for i, n in enumerate(rb.schema.names)
                    if n != "record"}
            # the record column stays in Arrow: per-row memoryview slices
            # over the shared data buffer instead of to_pylist()'s
            # per-record bytes copies (the column is the batch's bulk —
            # ~250 MB per 500k records — and zlib/crc32 consume buffers)
            rcol = rb.column(rb.schema.names.index("record"))
            width = 8 if pa.types.is_large_binary(rcol.type) else 4
            dtype = "int64" if width == 8 else "int32"
            import numpy as np

            offs = np.frombuffer(rcol.buffers()[1], dtype=dtype,
                                 count=len(rcol) + 1,
                                 offset=rcol.offset * width)
            rdata = memoryview(rcol.buffers()[2])
            for j in range(rb.num_rows):
                name = cols["warc_file"][j]
                if name != cur_name:
                    flush()
                    cur_name = name
                    # stream records straight to the temp file — executor
                    # memory stays O(record), never O(archive file)
                    cur_f = open(os.path.join(path, name + ext)
                                 + tmp_sfx, "wb")
                raw = rdata[offs[j]:offs[j + 1]]
                offset = cur_f.tell()
                if compress:
                    cur_f.write(_gzip_member(raw))
                else:
                    cur_f.write(raw)
                out_rows.append((
                    cols["surt"][j], cols["url"][j], cols["date"][j],
                    cols["status"][j], cols["mime"][j], cols["digest"][j],
                    name + ext, offset, cur_f.tell() - offset, len(raw),
                ))
        flush()
        if out_rows:
            names = [f.strip().split(" ")[0]
                     for f in CDX_SCHEMA.split(",")]
            arrays = list(zip(*out_rows))
            yield pa.RecordBatch.from_arrays(
                [pa.array(a, type=t) for a, t in zip(arrays, [
                    pa.string(), pa.string(), pa.string(), pa.int32(),
                    pa.string(), pa.string(), pa.string(), pa.int64(),
                    pa.int64(), pa.int64()])],
                names=names)

    return rec.mapInArrow(_write, CDX_SCHEMA)


def crawl_to_warc(results: DataFrame, path: str, n_files: int = 8,
                  compress: bool = True, revisits: bool = False,
                  base_date: str = "2026-01-01T") -> DataFrame:
    """Archive a :class:`~httpz_spark.plans.frontier.CrawlEngine` crawl:
    map the persisted ``results`` table (``store.read("results")``) onto
    :func:`write_warc` and return the CDX index frame.

    * body = the image payload ``bytes`` when the row carried one, else
      the captured ``body_preview`` re-encoded — the same capture the
      reference scanner emits.
    * WARC-Date derives from ``wave_id`` (``base_date`` + wave as
      HH:MM:SS, pure string arithmetic — no session-timezone
      dependence), so archiving is deterministic and a resumed crawl
      re-archives byte-identically.
    * rows with ``status < 0`` (transport errors — no HTTP response to
      frame) are skipped; they live in the results/lineage tables.
    * ``revisits=True`` additionally collapses repeat payloads across
      waves into header-only revisit records (recrawl archives shrink).
    """
    two = lambda c: F.lpad(c.cast("long").cast("string"), 2, "0")  # noqa: E731
    w = F.col("wave_id").cast("long")
    date = F.concat(F.lit(base_date), two(F.floor(w / 3600) % 24),
                    F.lit(":"), two(F.floor(w / 60) % 60), F.lit(":"),
                    two(w % 60), F.lit("Z"))
    # include_payload=False engines carry no "bytes" column — degrade to
    # the captured body_preview instead of an AnalysisException
    preview_body = F.encode(F.coalesce(F.col("body_preview"), F.lit("")),
                            "UTF-8")
    body = (F.coalesce(F.col("bytes"), preview_body)
            if "bytes" in results.columns else preview_body)
    d = (results.filter(F.col("status") >= 0)
         .select(F.coalesce(F.col("url"), F.col("url_canon")).alias("url"),
                 date.alias("date"), "status", "content_type",
                 body.alias("body")))
    return write_warc(d, path, n_files=n_files, compress=compress,
                      revisits=revisits)


WET_STAGE_SCHEMA = "url string, date string, text string"


def wet_from_warc(records: DataFrame) -> DataFrame:
    """Text extraction for WET derivation: response records only, one
    Arrow stage.  HTML bodies run the same single-pass page parser the
    fetch stage uses (script/style/noscript decomposed, whitespace
    normalized); other ``text/*`` bodies decode as-is; binary payloads
    (images etc.) have no text conversion and are skipped.  Returns
    (url, date, text)."""
    src = (records.filter(F.col("warc_type") == "response")
           .select(F.col("target_uri").alias("url"), F.col("date"),
                   F.col("http_content_type").alias("ctype"),
                   F.col("body")))

    def _extract(batches):
        import pyarrow as pa

        from httpz_spark.functions.htmlx import parse_page
        from httpz_spark.parity import refmodel as R

        for rb in batches:
            urls, dates, ctypes, bodies = (rb.column(i).to_pylist()
                                           for i in range(4))
            out = ([], [], [])
            for u, d, c, b in zip(urls, dates, ctypes, bodies):
                c = (c or "").lower()
                if b is None:
                    continue
                if "html" in c:
                    page = parse_page(b.decode("utf-8", errors="replace"))
                    text = (R.normalize_text(" ".join(page.text_parts))
                            if page else "")
                elif c.startswith("text/") or c == "":
                    text = b.decode("utf-8", errors="replace")
                else:
                    continue
                out[0].append(u)
                out[1].append(d)
                out[2].append(text)
            if out[0]:
                yield pa.RecordBatch.from_arrays(
                    [pa.array(a, pa.string()) for a in out],
                    names=["url", "date", "text"])

    return src.mapInArrow(_extract, WET_STAGE_SCHEMA)


def write_wet(records: DataFrame, path: str, n_files: int = 8,
              compress: bool = True) -> DataFrame:
    """Derive and write the WET companion archive (plain-text
    ``conversion`` records — what Common Crawl ships next to every WARC
    segment) from a :func:`read_warc` frame; returns the CDX index
    frame.  The conversion framing is native
    (:func:`httpz_spark.functions.warcx.warc_conversion_record`); only
    the HTML→text step runs Python, Arrow-batched."""
    ext = ".warc.wet.gz" if compress else ".warc.wet"
    t = wet_from_warc(records)
    rec = t.select(
        surt_key(F.col("url")).alias("surt"), "url", "date",
        F.lit(None).cast("int").alias("status"),
        F.lit("text/plain").alias("mime"),
        F.md5(F.encode(F.col("text"), "UTF-8")).alias("digest"),
        warc_file_assign(F.col("url"), n_files).alias("warc_file"),
        warc_conversion_record(F.col("url"), F.col("date"),
                               F.col("text")).alias("record"))
    return write_records(rec, path, n_files=n_files, compress=compress,
                         ext=ext)


WAT_STAGE_SCHEMA = "url string, date string, meta string"


def wat_from_warc(records: DataFrame) -> DataFrame:
    """Metadata extraction for WAT derivation: response records only,
    one Arrow stage.  Emits a deterministic JSON envelope per capture
    (sorted keys, no whitespace): HTTP status, content type, payload
    digest, body length, and for HTML bodies the extracted outlinks
    (the same link extractor the crawl's discovery path uses).  Returns
    (url, date, meta)."""
    src = (records.filter(F.col("warc_type") == "response")
           .select(F.col("target_uri").alias("url"), F.col("date"),
                   F.col("http_status").alias("status"),
                   F.col("http_content_type").alias("ctype"),
                   F.col("payload_digest").alias("digest"),
                   F.col("body")))

    def _extract(batches):
        import json as _json

        import pyarrow as pa

        from httpz_spark.functions.htmlx import extract_links

        for rb in batches:
            urls, dates, statuses, ctypes, digests, bodies = (
                rb.column(i).to_pylist() for i in range(6))
            out = ([], [], [])
            for u, d, s, c, dg, b in zip(urls, dates, statuses, ctypes,
                                         digests, bodies):
                links = []
                if b is not None and "html" in (c or "").lower():
                    links = extract_links(
                        b.decode("utf-8", errors="replace"), u)
                meta = _json.dumps(
                    {"Content-Length": len(b) if b is not None else 0,
                     "Content-Type": c, "Links": links,
                     "Payload-Digest": dg, "Status": s, "URL": u},
                    sort_keys=True, separators=(",", ":"))
                out[0].append(u)
                out[1].append(d)
                out[2].append(meta)
            if out[0]:
                yield pa.RecordBatch.from_arrays(
                    [pa.array(a, pa.string()) for a in out],
                    names=["url", "date", "meta"])

    return src.mapInArrow(_extract, WAT_STAGE_SCHEMA)


def wat_outlink_edges(wat: DataFrame) -> DataFrame:
    """Host-graph edges from a WAT frame (:func:`wat_from_warc` output or
    a read-back WAT archive's decoded JSON): explode each capture's
    ``Links`` into ``(src, dst)`` host pairs, self-loops dropped — the
    input :func:`httpz_spark.operators.linkrank.host_pagerank` ranks and
    ``rank_priority`` turns into frontier priorities.  Native
    ``from_json`` + explode; no Python."""
    host = lambda c: F.regexp_extract(c, r"^https?://([^/]+)", 1)  # noqa: E731
    return (wat.select(
                host(F.col("url")).alias("src"),
                F.explode(F.from_json(
                    "meta", "struct<Links:array<string>>")
                    .getField("Links")).alias("link"))
            .select("src", host(F.col("link")).alias("dst"))
            .filter((F.col("dst") != "") & (F.col("src") != F.col("dst"))))


def write_wat(records: DataFrame, path: str, n_files: int = 8,
              compress: bool = True) -> DataFrame:
    """Derive and write the WAT companion archive (JSON ``metadata``
    records — Common Crawl's third product next to WARC and WET) from a
    :func:`read_warc` frame; returns the CDX index frame."""
    ext = ".warc.wat.gz" if compress else ".warc.wat"
    t = wat_from_warc(records)
    rec = t.select(
        surt_key(F.col("url")).alias("surt"), "url", "date",
        F.lit(None).cast("int").alias("status"),
        F.lit("application/json").alias("mime"),
        F.md5(F.encode(F.col("meta"), "UTF-8")).alias("digest"),
        warc_file_assign(F.col("url"), n_files).alias("warc_file"),
        warc_metadata_record(F.col("url"), F.col("date"),
                             F.col("meta")).alias("record"))
    return write_records(rec, path, n_files=n_files, compress=compress,
                         ext=ext)


def make_warc_batch_handler(path: str, n_files: int = 4,
                            compress: bool = True, revisits: bool = False):
    """``foreachBatch`` archive sink for a streaming crawl: each
    micro-batch (capture-frame schema — url/date/status/content_type/
    body) archives under ``<path>/batch_id=N/`` with its CDX partition
    at ``<path>/cdx/batch_id=N``.

    Exactly-once under Structured Streaming's redelivery without any
    coordination: framing is fully hash-derived and the writer's layout
    is a total order, so a replayed batch rewrites every archive file
    BYTE-IDENTICALLY (os.replace atomic swap) and overwrites its own
    CDX partition — tested by calling the handler twice with one
    batch_id.  ``revisits`` collapses repeats WITHIN a batch; cross-
    batch revisit collapse belongs in a downstream compaction that joins
    prior CDX digests (the per-batch handler stays stateless)."""
    def handle(batch_df: DataFrame, batch_id: int) -> None:
        out = os.path.join(path, f"batch_id={batch_id}")
        cdx = write_warc(batch_df, out, n_files=n_files,
                         compress=compress, revisits=revisits)
        (cdx.write.mode("overwrite")
            .parquet(os.path.join(path, "cdx", f"batch_id={batch_id}")))

    return handle


def batch_cdx_with_paths(spark: SparkSession, arch_root: str) -> DataFrame:
    """Load a streaming archive's CDX partitions (``<root>/cdx``) and
    attach each row's absolute source path
    (``<root>/batch_id=N/<warc_file>``) — the input shape
    :func:`compact_warc` consumes."""
    cdx = spark.read.parquet(os.path.join(arch_root, "cdx"))
    return cdx.withColumn(
        "src_path",
        F.concat(F.lit(arch_root + os.sep + "batch_id="),
                 F.col("batch_id").cast("string"), F.lit(os.sep),
                 F.col("warc_file")))


def compact_warc(cdx: DataFrame, dst: str, n_files: int = 8) -> DataFrame:
    """Fold many small archives (a streaming run's ``batch_id=N`` dirs,
    a too-granular crawl) into ``n_files`` consolidated ones — the
    archive analogue of the seen-store/StateStore compaction that keeps
    long-running jobs' file counts bounded.

    Input: a CDX frame carrying ``src_path`` (absolute archive file per
    row — see :func:`batch_cdx_with_paths`) plus the standard CDX
    columns.  Records are copied as RAW member bytes via their
    (offset, length) seek points — never decoded or re-framed — so
    record ids, digests, and byte content are preserved exactly, and
    gzip members remain individually seekable in the new files.  Rows
    are co-located per destination file and laid out in CDX total order
    (same keys as the writer), so compaction is deterministic: running
    it twice produces byte-identical archives.  Returns the new CDX.

    Scale shape: one shuffle keyed on the destination file; each task
    streams O(record) bytes with an LRU of source file handles.  Source
    files must be reachable from executors (shared filesystem — the
    same requirement the writer already has)."""
    os.makedirs(dst, exist_ok=True)
    # the destination EXTENSION is derived per row from its source file
    # (".warc" + whatever follows — ".warc" or ".warc.gz") and rides the
    # sort key: mixed-compression inputs land in distinct, correctly
    # labeled destination files instead of being concatenated under the
    # first row's extension (which read_warc would then mis-dispatch),
    # and rows of one (file, ext) stay contiguous so the writer never
    # reopens-and-truncates a destination it already flushed
    ext_col = F.concat(
        F.lit(".warc"), F.substring_index(F.col("src_path"), ".warc", -1)
    )
    rec = (cdx.select("surt", "url", "date", "status", "mime", "digest",
                      "record_length", "src_path", "offset", "length",
                      warc_file_assign(F.col("url"), n_files)
                      .alias("new_file"),
                      ext_col.alias("_ext"))
              .repartition(n_files, "new_file")
              .sortWithinPartitions("new_file", "_ext", "surt", "url",
                                    "date", "digest"))

    def _copy(batches):
        from collections import OrderedDict

        import pyarrow as pa
        from pyspark import TaskContext

        tc = TaskContext.get()
        tmp_sfx = f".inprogress-{tc.taskAttemptId()}" if tc else ".inprogress"
        handles: OrderedDict = OrderedDict()

        def src(p):
            # true LRU: refresh on access, evict the LEAST recently used
            # (dict.popitem() evicted the most recent, pinning 15 stale
            # handles forever and thrashing open/close past 16 sources)
            h = handles.get(p)
            if h is None:
                if len(handles) >= 16:
                    handles.popitem(last=False)[1].close()
                h = handles[p] = open(p, "rb")
            else:
                handles.move_to_end(p)
            return h

        cur_name, cur_f, out_rows = None, None, []

        def flush():
            if cur_name is None:
                return
            cur_f.close()
            final = os.path.join(dst, cur_name)
            os.replace(final + tmp_sfx, final)

        for rb in batches:
            cols = {n: rb.column(i).to_pylist()
                    for i, n in enumerate(rb.schema.names)}
            for j in range(rb.num_rows):
                sp = cols["src_path"][j]
                name = cols["new_file"][j] + cols["_ext"][j]
                if name != cur_name:
                    flush()
                    cur_name = name
                    cur_f = open(os.path.join(dst, name) + tmp_sfx,
                                 "wb")
                f = src(sp)
                f.seek(cols["offset"][j])
                member = f.read(cols["length"][j])
                new_off = cur_f.tell()
                cur_f.write(member)
                out_rows.append((
                    cols["surt"][j], cols["url"][j], cols["date"][j],
                    cols["status"][j], cols["mime"][j], cols["digest"][j],
                    name, new_off, len(member), cols["record_length"][j],
                ))
        flush()
        for h in handles.values():
            h.close()
        if out_rows:
            names = [f.strip().split(" ")[0] for f in CDX_SCHEMA.split(",")]
            arrays = list(zip(*out_rows))
            yield pa.RecordBatch.from_arrays(
                [pa.array(a, type=t) for a, t in zip(arrays, [
                    pa.string(), pa.string(), pa.string(), pa.int32(),
                    pa.string(), pa.string(), pa.string(), pa.int64(),
                    pa.int64(), pa.int64()])],
                names=names)

    return rec.mapInArrow(_copy, CDX_SCHEMA)


def fetch_record(path: str, warc_file: str, offset: int,
                 length: int) -> tuple[dict, bytes]:
    """Random access: seek ONE record out of an archive using its CDX
    row — the lookup the index exists for.  Reads ``length`` bytes at
    ``offset`` (a gzip member for ``.gz`` archives, raw framing
    otherwise), parses it, and returns (warc_headers, payload).  Pure
    driver-side file IO: O(record), never scans the archive."""
    with open(os.path.join(path, warc_file), "rb") as f:
        f.seek(offset)
        raw = f.read(length)
    if raw[:2] == b"\x1f\x8b":
        raw = next(_gzip_members(raw))[1]
    _, _, hdrs, payload = next(_parse_records(raw))
    return hdrs, payload


# ---------------------------------------------------------------------------
# reader
# ---------------------------------------------------------------------------

_GZ_CHUNK = 1 << 18


def _gzip_members(blob: bytes) -> Iterator[tuple[int, bytes]]:
    """(compressed_offset, decompressed_member) per gzip member — manual
    decompressobj loop so member boundaries (the CDX seek points) are
    recovered.  Input is fed in bounded chunks: handing decompress the
    whole remaining blob would make zlib COPY the entire tail into
    ``unused_data`` per member — O(members x file_size) memcpy, ~50x
    slower on record-at-time archives (measured)."""
    mv = memoryview(blob)
    pos = 0
    while pos < len(blob):
        d = zlib.decompressobj(wbits=31)
        parts = []
        fed = 0
        while not d.eof and pos + fed < len(blob):
            chunk = mv[pos + fed:pos + fed + _GZ_CHUNK]
            parts.append(d.decompress(chunk))
            fed += len(chunk)
        if not d.eof:
            raise ValueError(f"corrupt gzip member at offset {pos}")
        parts.append(d.flush())
        consumed = fed - len(d.unused_data)
        if consumed <= 0:
            raise ValueError(f"corrupt gzip member at offset {pos}")
        yield pos, b"".join(parts)
        pos += consumed


def _parse_records(blob: bytes) -> Iterator[tuple[int, int, dict, bytes]]:
    """(offset, record_length, warc_headers, payload) per record in a
    plain (uncompressed) WARC stream — ISO 28500 framing: version line +
    named fields, CRLF CRLF, Content-Length payload bytes, CRLF CRLF."""
    pos = 0
    while pos < len(blob):
        head_end = blob.index(b"\r\n\r\n", pos)
        head = blob[pos:head_end].decode("utf-8", errors="replace")
        lines = head.split("\r\n")
        if not lines[0].startswith("WARC/"):
            raise ValueError(f"bad WARC version line at {pos}: {lines[0]!r}")
        hdrs = {}
        for line in lines[1:]:
            k, _, v = line.partition(":")
            hdrs[k.strip().lower()] = v.strip()
        clen = int(hdrs["content-length"])
        body_start = head_end + 4
        payload = blob[body_start:body_start + clen]
        end = body_start + clen
        if blob[end:end + 4] != b"\r\n\r\n":
            raise ValueError(f"missing record trailer at {end}")
        yield pos, end + 4 - pos, hdrs, payload
        pos = end + 4


def _split_http(payload: bytes) -> tuple[int | None, str | None, bytes]:
    """(status, content_type, body) from an application/http payload."""
    sep = payload.find(b"\r\n\r\n")
    if sep < 0 or not payload.startswith(b"HTTP/"):
        return None, None, payload
    head = payload[:sep].decode("utf-8", errors="replace")
    lines = head.split("\r\n")
    parts = lines[0].split(" ", 2)
    status = int(parts[1]) if len(parts) > 1 and parts[1].isdigit() else None
    ctype = None
    for line in lines[1:]:
        k, _, v = line.partition(":")
        if k.strip().lower() == "content-type":
            ctype = v.strip()
    return status, ctype, payload[sep + 4:]


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Read a WARC archive directory into a records DataFrame (schema
    ``READ_SCHEMA``).  One binaryFile task per archive file; plain and
    record-at-time-gzip files both handled; ``offset`` is the seekable
    byte offset in the file AS STORED (compressed offset for .gz)."""
    # exact-extension glob: never matches ".inprogress" temps a killed
    # writer left behind (those may hold duplicate/truncated members)
    files = (spark.read.format("binaryFile")
             .load(os.path.join(
                 path, "*.{warc,warc.gz,warc.wet,warc.wet.gz,"
                       "warc.wat,warc.wat.gz}"))
             .select("path", "content"))

    def _parse(batches):
        import pyarrow as pa

        for rb in batches:
            paths = rb.column(0).to_pylist()
            blobs = rb.column(1).to_pylist()
            rows = []
            for p, blob in zip(paths, blobs):
                base = os.path.basename(p)
                is_gz = blob[:2] == b"\x1f\x8b"
                units = _gzip_members(blob) if is_gz else iter([(0, blob)])
                for unit_off, data in units:
                    for rec_off, rec_len, hdrs, payload in _parse_records(data):
                        status, ctype, body = (
                            _split_http(payload)
                            if "http" in hdrs.get("content-type", "")
                            else (None, None, payload))
                        # one record per gzip member when we wrote it, so
                        # the seekable offset is the member's; foreign
                        # multi-record members inherit the member offset
                        refers = hdrs.get("warc-refers-to")
                        rows.append((
                            base, unit_off + (0 if is_gz else rec_off),
                            hdrs.get("warc-record-id", "").strip("<>"),
                            hdrs.get("warc-type"),
                            hdrs.get("warc-date"),
                            hdrs.get("warc-target-uri"),
                            hdrs.get("warc-payload-digest"),
                            refers.strip("<>") if refers else None,
                            status, ctype, body, rec_len,
                        ))
            if rows:
                arrays = list(zip(*rows))
                yield pa.RecordBatch.from_arrays(
                    [pa.array(a, type=t) for a, t in zip(arrays, [
                        pa.string(), pa.int64(), pa.string(), pa.string(),
                        pa.string(), pa.string(), pa.string(), pa.string(),
                        pa.int32(), pa.string(), pa.binary(), pa.int64()])],
                    names=[f.strip().split(" ")[0]
                           for f in READ_SCHEMA.split(",")])

    return files.mapInArrow(_parse, READ_SCHEMA)
