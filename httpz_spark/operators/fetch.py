"""The vectorized fetch stage — ``mapInPandas`` over Arrow batches.

This is the engine's replacement for the reference's asyncio scan loop
(``/root/reference/httpz_scanner/scanner.py:206-379``): each executor task
receives Arrow record batches of scheduled URLs (+ joined payload columns),
runs the retry/fallback state machine per row, performs enrichment
(title/body/favicon/TLS via the batched kernels), and emits result batches.

Scale properties:

* Parallelism = partitions × per-partition concurrency.  The per-row scan
  state machine is sans-IO (a generator yielding fetch requests): with the
  CPU-bound synthetic fabric rows run sequentially per task, while
  real-network transports exposing ``fetch_many`` drive ALL rows of the
  batch as interleaved coroutines under an asyncio semaphore
  (concurrent_limit in flight per task — scanner.py:430-440's analogue), so
  production throughput is concurrency-bound, not latency-bound.  Same
  state machine either way ⇒ identical results by construction (tested with
  a latency-injecting fake transport).
* No driver round-trips: config + fabric rules travel in the closure;
  payload rows ride the batch (the sandbox substitute for the network).
* Certs are parsed once per distinct DER per batch (hosts share certs).
* ONE transport per task (not per batch or row), closed when the batch
  iterator is exhausted: real transports own an event loop (and a session/
  connector for aiohttp), so construction stays out of the hot loop and
  nothing leaks on long-running tasks.  The record provider is a mutable
  pointer swapped per row.
* Batch columns are unpacked once into python lists (``to_dict("records")``
  builds a dict per row and measured ~2× slower); output is assembled
  column-wise.
* A UDF exception never kills the Spark task: every row is wrapped and
  errors become taxonomy rows — scanner.py:409-414 (PROCESS) semantics.
"""

from __future__ import annotations

import urllib.parse
from collections.abc import Iterator

import pandas as pd

from httpz_spark.config import ScanConfig
from httpz_spark.functions.htmlx import parse_page
from httpz_spark.functions.tlsx import parse_cert_der
from httpz_spark.functions.ua import ua_for
from httpz_spark.parity import refmodel as R
from httpz_spark.sources.fabric import FabricConfig, FabricTransport, image_record
from httpz_spark.sources.transport import drive_scan_sync

RESULT_COLUMNS = (
    "url string, status int, protocol string, "
    "response_headers map<string,string>, content_type string, "
    "content_length long, content_length_raw string, "
    "redirect_chain array<string>, title string, body_preview string, "
    "body_clean string, favicon_hash string, "
    "tls struct<fingerprint:string,subject:string,issuer:string,email:string,"
    "alt_names:array<string>,not_before:string,not_after:string>, "
    "error string, error_type string, latency_ms double, attempts int, "
    "discovered array<string>"
)

_RESULT_KEYS = (
    "url", "status", "protocol", "response_headers", "content_type",
    "content_length", "content_length_raw", "redirect_chain", "title",
    "body_preview", "body_clean", "favicon_hash", "tls", "error",
    "error_type", "latency_ms", "attempts", "discovered",
)


def fetch_output_schema(passthrough: str) -> str:
    """Full mapInPandas output schema: passthrough columns + result columns."""
    return f"{passthrough}, {RESULT_COLUMNS}"


def _process_row(e: BaseException) -> dict:
    """Containment row for a row whose scan logic itself blew up —
    scanner.py:409-414 (PROCESS) semantics."""
    result = _empty_result()
    result["error_type"] = "PROCESS"
    result["error"] = f"{e.__class__.__name__}: {e}"
    result["protocol"] = "unknown"
    return result


def _empty_result() -> dict:
    return {
        "url": None, "status": -1, "protocol": None, "response_headers": None,
        "content_type": None, "content_length": None, "content_length_raw": None,
        "redirect_chain": None, "title": None, "body_preview": None,
        "body_clean": None, "favicon_hash": None, "tls": None,
        "error": None, "error_type": None, "latency_ms": 0.0, "attempts": 0,
        "discovered": None,
    }


def _fetch_one(
    url: str, protocol: str, cfg: ScanConfig,
    attempt: int, cert_cache: dict, custom_headers: dict | None,
):
    """One attempt — the engine's column-shaped analogue of scanner.py:206-309.

    Sans-IO generator: every network round-trip is a ``yield (url, protocol,
    kwargs)`` request answered with ``(response, transport_error)``.  The
    SAME state machine runs under the sequential driver (fabric/CPU-bound
    transports) and the asyncio-concurrent driver (real-network transports)
    — see :mod:`httpz_spark.sources.transport`."""
    out = _empty_result()
    out["protocol"] = protocol
    # seeded UA (A24) + custom headers merged over it (scanner.py:209-212);
    # method is POST iff post_data is set (scanner.py:212)
    headers = {"User-Agent": ua_for(url, attempt, cfg.ua_seed)}
    if custom_headers:
        headers.update(custom_headers)
    resp, err = yield (url, protocol, {
        "attempt": attempt,
        "follow_redirects": cfg.follow_redirects,
        "max_redirects": cfg.max_redirects,
        "method": "POST" if cfg.post_data is not None else "GET",
        "request_headers": headers,
    })
    if err is not None:
        out["error_type"] = err.error_type
        out["error"] = err.message
        return out

    out["url"] = resp.url
    out["status"] = resp.status
    out["latency_ms"] = float(resp.latency_ms)
    if cfg.fetch_headers:
        out["response_headers"] = dict(resp.headers)
    if cfg.fetch_content_type:
        out["content_type"] = resp.headers.get("Content-Type")
    if cfg.fetch_content_length:
        cl = resp.headers.get("Content-Length")
        if cl is not None:
            try:
                out["content_length"] = int(cl)
            except ValueError:
                out["content_length_raw"] = cl  # int/str union split into 2 cols
    if resp.history:
        out["redirect_chain"] = list(resp.history)
    if cfg.fetch_tls and protocol == "https" and resp.cert_der is not None:
        key = hash(resp.cert_der)
        if key not in cert_cache:
            cert_cache[key] = parse_cert_der(resp.cert_der)
        out["tls"] = cert_cache[key]

    if cfg.needs_body:
        raw_body = resp.body[: R.MAX_BODY_BYTES]
        encoding = resp.charset or "utf-8"
        if cfg.fetch_body:
            out["body_preview"] = R.body_preview(raw_body, encoding=encoding)
        try:
            html_text = raw_body.decode(encoding, errors="replace")
        except Exception:
            # unknown codec name -> utf-8 fallback (scanner.py:281-283;
            # errors='replace' does not protect against LookupError)
            html_text = raw_body.decode("utf-8", errors="replace")

        # ONE parser pass extracts title + clean text + favicon link +
        # outlinks (HTMLParser dominates the hot path; parity with the
        # reference model's separate parsers is covered by the suite)
        page = parse_page(html_text)

        if cfg.fetch_body:
            text = R.normalize_text(" ".join(page.text_parts))
            out["body_clean"] = text[: R.BODY_CLEAN_CHARS] if text else None
        if cfg.fetch_title:
            ct = resp.headers.get("Content-Type")
            if not (ct and not any(x in ct.lower() for x in ("text/html", "application/xhtml"))):
                if page.title_raw is not None:
                    title = R.normalize_text(page.title_raw)
                    out["title"] = title[: R.TITLE_MAX_CHARS] if title else None
        if cfg.fetch_favicon and resp.status is not None:
            out["favicon_hash"] = yield from _favicon(
                resp.url, page.favicon_href, protocol
            )
        if cfg.discover_links and resp.status == 200:
            links = []
            for href in page.hrefs:
                absu = resolve_href(resp.url, href)
                if absu.startswith(("http://", "https://")):
                    links.append(absu)
            out["discovered"] = links
    return out


def resolve_href(base_url: str, href: str) -> str:
    """urljoin with byte-identical fast paths for the two shapes that
    dominate (abs-http and root-relative).  The '/.' guard routes dot
    segments to urljoin's normalization ('/a/../b' -> 'https://h/b'):
    without it frontier dedup would treat equal URLs as distinct."""
    if href.startswith(("http://", "https://")):
        return href
    if href.startswith("/") and not href.startswith("//") and "/." not in href:
        return _origin_of(base_url) + href
    return urllib.parse.urljoin(base_url, href)


def _origin_of(url: str) -> str:
    """scheme://netloc of a URL whose path starts at the first '/' after the
    authority (true for every transport-returned final URL); equals
    urlparse(url).scheme + '://' + netloc for those shapes."""
    scheme, _, rest = url.partition("://")
    netloc = rest.split("/", 1)[0]
    if "?" in netloc or "#" in netloc:  # no path before query — rare; exact
        p = urllib.parse.urlparse(url)
        return f"{p.scheme}://{p.netloc}"
    return f"{scheme}://{netloc}"


def _favicon(final_url, favicon_href, protocol):
    """Second GET for the favicon — parsers.py:205-254 semantics (the href
    comes from the combined page parse).  Sans-IO generator."""
    href = favicon_href or "/favicon.ico"
    if href.startswith("/") and not href.startswith("//") and "/." not in href:
        favicon_url = _origin_of(final_url) + href
    else:
        favicon_url = urllib.parse.urljoin(_origin_of(final_url), href)
    resp, err = yield (favicon_url, protocol, {"attempt": 0})
    if err is not None:
        return None
    if resp.status != 200:
        return None
    return R.favicon_hash(resp.body)


def scan_row_gen(
    target: str, port, proto_first: str, proto_second: str,
    cfg: ScanConfig, cert_cache: dict, custom_headers: dict | None,
):
    """Protocol fallback + retries for one scheduled URL —
    scanner.py:312-379 semantics (CERT/SSL fall back but never retry;
    TIMEOUT/CONN/HTTP retry with linear backoff, simulated as latency).

    Sans-IO generator (see :func:`_fetch_one`): the return value is the
    final result dict; drivers deliver it via StopIteration."""
    last_error = None
    success = None
    total_latency = 0.0
    total_attempts = 0
    for protocol in (proto_first, proto_second):
        url = f"{protocol}://{target}"
        if port:  # falsy check: explicit port 0 is skipped (scanner.py:356-357)
            url += f":{port}"
        attempts = 1 + max(0, cfg.retries)
        result = None
        for attempt in range(attempts):
            result = yield from _fetch_one(
                url, protocol, cfg, attempt, cert_cache, custom_headers
            )
            total_attempts += 1
            total_latency += result["latency_ms"]
            if result["status"] >= 0:
                break
            if result["error_type"] not in R.TRANSIENT_ERROR_TYPES:
                break
            if attempt < attempts - 1:
                total_latency += cfg.retry_backoff * 1000.0 * (attempt + 1)
        if result["status"] >= 0:
            success = result
            break
        last_error = result
        if result["error_type"] not in R.FALLBACK_ERROR_TYPES:
            break

    final = success if success is not None else last_error
    final["latency_ms"] = total_latency
    final["attempts"] = total_attempts
    return final


class _BatchProvider:
    """record_provider with a mutable per-row pointer: ONE instance serves a
    whole Arrow batch (the loop swaps ``rec`` before each row's fetch).
    Falls back to deterministic regeneration for off-row pages (favicon
    neighbors, redirect targets — identical bytes by construction)."""

    __slots__ = ("rec", "cfg")

    def __init__(self, fabric_cfg: FabricConfig):
        self.rec = None
        self.cfg = fabric_cfg

    def __call__(self, image_id: str) -> dict:
        rec = self.rec
        if rec is not None and image_id == rec["image_id"] and rec.get("caption") is not None:
            return rec
        return image_record(image_id, self.cfg)


def make_fetch_stage(
    cfg: ScanConfig,
    fabric_cfg: FabricConfig,
    passthrough_cols: list,
    transport_factory=None,
    stop_file: str | None = None,
):
    """Build the mapInPandas function.  ``passthrough_cols`` are copied from
    input to output verbatim (keys, payload, cname/ips columns).

    ``transport_factory(record_provider) -> Transport`` is the production
    seam: default is the deterministic fabric; a real deploy passes e.g.
    ``lambda rp: AiohttpTransport(timeout_s=cfg.timeout)`` (the provider is
    fabric-specific and real transports ignore it).

    ``stop_file``: cooperative-stop sentinel checked before EVERY Arrow
    batch; when present the task raises, aborting the staging job before
    its commit (the engine's drain semantics — plans/frontier.py)."""

    def fetch_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cert_cache: dict = {}
        custom_headers = dict(cfg.custom_headers) if cfg.custom_headers else None
        # ONE transport per task, shared across all Arrow batches and closed
        # when the batch iterator is exhausted — real transports own an event
        # loop (+ ClientSession/TCPConnector for aiohttp), so per-batch
        # construction without close() leaked loops and FDs on long tasks
        # (round-3 review finding; the transports' own docstrings promise
        # "one instance per executor task").  Batch schemas are constant
        # within a task, so the payload-provider decision made on the first
        # non-empty batch holds for all of them.
        transport = None
        provider = None

        try:
            for pdf in batches:
                if stop_file is not None:
                    import os

                    if os.path.exists(stop_file):
                        raise RuntimeError("cooperative stop requested")
                n = len(pdf)
                if n == 0:
                    continue
                cols = set(pdf.columns)
                has_payload = "image_id" in cols and "caption" in cols
                if transport is None:
                    provider = _BatchProvider(fabric_cfg) if has_payload else None
                    if transport_factory is not None:
                        transport = transport_factory(provider)
                    else:
                        transport = FabricTransport(fabric_cfg, record_provider=provider)

                # unpack columns ONCE (python lists beat per-row .loc/dict access)
                targets = pdf["scan_target"].tolist()
                ports = [None if pd.isna(p) else int(p) for p in pdf["port"].tolist()]
                p1s = pdf["proto_first"].tolist()
                p2s = pdf["proto_second"].tolist()
                if has_payload:
                    iids = pdf["image_id"].tolist()
                    caps = pdf["caption"].tolist()
                    ws = pdf["w"].tolist()
                    hs = pdf["h"].tolist()
                    fmts = pdf["fmt"].tolist()
                    byts = pdf["bytes"].tolist() if "bytes" in cols else None
                    phs = pdf["phash"].tolist() if "phash" in cols else None
                    if "host" in cols and "path" in cols:
                        # frontier rows resolve page-path image ids natively and
                        # leave root/odd paths NULL — resolve those here (rare)
                        # so the emitted image_id column is complete; their
                        # payload record regenerates in-transport either way
                        from httpz_spark.sources.fabric import page_image_id

                        hosts = pdf["host"].tolist()
                        paths = pdf["path"].tolist()
                        fixed = False
                        for i in range(n):
                            if iids[i] is None and hosts[i] is not None:
                                hp = hosts[i]
                                bare = (
                                    hp.rsplit(":", 1)[0]
                                    if ":" in hp and hp.rsplit(":", 1)[1].isdigit()
                                    else hp
                                )
                                iids[i] = page_image_id(
                                    bare, paths[i] or "/", fabric_cfg
                                )
                                fixed = True
                        if fixed and "image_id" in passthrough_cols:
                            pdf = pdf.assign(image_id=iids)

                if hasattr(transport, "fetch_many"):
                    # batched-async seam: the transport drives ALL row state
                    # machines concurrently (asyncio semaphore inside the task —
                    # scanner.py:430-440's concurrent_limit analogue).  Such
                    # transports talk to a real network and ignore the payload
                    # provider; per-row containment comes back as exception
                    # objects in the ordered result list.
                    gens = [
                        scan_row_gen(targets[i], ports[i], p1s[i], p2s[i],
                                     cfg, cert_cache, custom_headers)
                        for i in range(n)
                    ]
                    results = [
                        _process_row(r) if isinstance(r, BaseException) else r
                        for r in transport.fetch_many(gens)
                    ]
                else:
                    results = []
                    append = results.append
                    for i in range(n):
                        if has_payload and iids[i] is not None:
                            provider.rec = {
                                "image_id": iids[i],
                                "bytes": byts[i] if byts is not None else None,
                                "w": ws[i], "h": hs[i], "fmt": fmts[i],
                                "caption": caps[i],
                                "phash": phs[i] if phs is not None else None,
                            }
                        elif provider is not None:
                            provider.rec = None
                        try:
                            result = drive_scan_sync(
                                scan_row_gen(targets[i], ports[i], p1s[i], p2s[i],
                                             cfg, cert_cache, custom_headers),
                                transport,
                            )
                        except Exception as e:  # containment — scanner.py:409-414
                            result = _process_row(e)
                        append(result)

                # column-wise assembly: passthrough columns copy as whole arrays
                # (row order is preserved 1:1), result columns gather per key
                data = {c: pdf[c].values for c in passthrough_cols}
                for key in _RESULT_KEYS:
                    data[key] = [r[key] for r in results]
                yield pd.DataFrame(data)
        finally:
            if transport is not None and hasattr(transport, "close"):
                transport.close()

    return fetch_batches
