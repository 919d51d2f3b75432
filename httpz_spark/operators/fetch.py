"""The vectorized fetch stage — ``mapInPandas`` over Arrow batches.

This is the engine's replacement for the reference's asyncio scan loop
(``/root/reference/httpz_scanner/scanner.py:206-379``): each executor task
receives Arrow record batches of scheduled URLs (+ joined payload columns),
runs the retry/fallback state machine per row, performs enrichment
(title/body/favicon/TLS via the batched kernels), and emits result batches.

Scale properties:

* Parallelism = partitions × per-partition concurrency.  With the synthetic
  fabric the per-row work is CPU-bound, so rows run sequentially per task;
  a real aiohttp transport would run them under an asyncio semaphore
  (concurrent_limit per task — scanner.py:430-440's analogue).
* No driver round-trips: config + fabric rules travel in the closure;
  payload rows ride the batch (the sandbox substitute for the network).
* Certs are parsed once per distinct DER per batch (hosts share certs).
* A UDF exception never kills the Spark task: every row is wrapped and
  errors become taxonomy rows — scanner.py:409-414 (PROCESS) semantics.
"""

from __future__ import annotations

import urllib.parse
from collections.abc import Iterator

import pandas as pd

from httpz_spark.config import ScanConfig
from httpz_spark.functions.tlsx import parse_cert_der
from httpz_spark.parity import refmodel as R
from httpz_spark.sources.fabric import FabricConfig, FabricError, FabricTransport

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


def fetch_output_schema(passthrough: str) -> str:
    """Full mapInPandas output schema: passthrough columns + result columns."""
    return f"{passthrough}, {RESULT_COLUMNS}"


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
    transport: FabricTransport, url: str, protocol: str, cfg: ScanConfig,
    attempt: int, cert_cache: dict,
) -> dict:
    """One attempt — the engine's column-shaped analogue of scanner.py:206-309."""
    out = _empty_result()
    out["protocol"] = protocol
    # seeded UA (A24) + custom headers merged over it (scanner.py:209-212);
    # method is POST iff post_data is set (scanner.py:212)
    from httpz_spark.functions.ua import ua_for

    headers = {"User-Agent": ua_for(url, attempt, cfg.ua_seed)}
    if cfg.custom_headers:
        headers.update(dict(cfg.custom_headers))
    try:
        resp = transport.fetch(
            url, protocol, attempt=attempt,
            follow_redirects=cfg.follow_redirects, max_redirects=cfg.max_redirects,
            method="POST" if cfg.post_data is not None else "GET",
            request_headers=headers,
        )
    except FabricError as e:
        out["error_type"] = e.error_type
        out["error"] = e.message
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
        html_text = raw_body.decode(encoding, errors="replace")

        # ONE parser pass extracts title + clean text + favicon link +
        # outlinks (HTMLParser dominates the hot path; parity with the
        # reference model's separate parsers is covered by the suite)
        from httpz_spark.functions.htmlx import parse_page

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
            out["favicon_hash"] = _favicon(
                transport, resp.url, page.favicon_href, protocol, cfg
            )
        if cfg.discover_links and resp.status == 200:
            links = []
            for href in page.hrefs:
                absu = urllib.parse.urljoin(resp.url, href)
                if absu.startswith(("http://", "https://")):
                    links.append(absu)
            out["discovered"] = links
    return out


def _favicon(transport, final_url, favicon_href, protocol, cfg) -> str | None:
    """Second GET for the favicon — parsers.py:205-254 semantics (the href
    comes from the combined page parse)."""
    parsed = urllib.parse.urlparse(final_url)
    base = f"{parsed.scheme}://{parsed.netloc}"
    favicon_url = urllib.parse.urljoin(base, favicon_href or "/favicon.ico")
    try:
        resp = transport.fetch(favicon_url, protocol, attempt=0)
    except FabricError:
        return None
    if resp.status != 200:
        return None
    return R.favicon_hash(resp.body)


def _scan_row(row: dict, transport, cfg: ScanConfig, cert_cache: dict) -> dict:
    """Protocol fallback + retries for one scheduled URL —
    scanner.py:312-379 semantics (CERT/SSL fall back but never retry;
    TIMEOUT/CONN/HTTP retry with linear backoff, simulated as latency)."""
    protocols = [row["proto_first"], row["proto_second"]]
    port = row.get("port")
    target = row["scan_target"]

    last_error = None
    success = None
    total_latency = 0.0
    total_attempts = 0
    for protocol in protocols:
        url = f"{protocol}://{target}"
        if port is not None and not pd.isna(port):
            url += f":{int(port)}"
        attempts = 1 + max(0, cfg.retries)
        result = None
        for attempt in range(attempts):
            result = _fetch_one(transport, url, protocol, cfg, attempt, cert_cache)
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


def make_fetch_stage(
    cfg: ScanConfig,
    fabric_cfg: FabricConfig,
    passthrough_cols: list,
):
    """Build the mapInPandas function.  ``passthrough_cols`` are copied from
    input to output verbatim (keys, payload, cname/ips columns)."""

    def fetch_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cert_cache: dict = {}

        for pdf in batches:
            if len(pdf) == 0:
                continue
            has_payload = "image_id" in pdf.columns and "caption" in pdf.columns
            out_rows = []
            for row in pdf.to_dict("records"):
                if has_payload and row.get("image_id") is not None:
                    rec = {
                        "image_id": row["image_id"],
                        "bytes": row.get("bytes"),
                        "w": row.get("w"), "h": row.get("h"),
                        "fmt": row.get("fmt"), "caption": row.get("caption"),
                        "phash": row.get("phash"),
                    }
                    provider = _RowProvider(rec, fabric_cfg)
                else:
                    provider = None
                transport = FabricTransport(fabric_cfg, record_provider=provider)
                try:
                    result = _scan_row(row, transport, cfg, cert_cache)
                except Exception as e:  # containment — scanner.py:409-414
                    result = _empty_result()
                    result["error_type"] = "PROCESS"
                    result["error"] = f"{e.__class__.__name__}: {e}"
                    result["protocol"] = "unknown"
                merged = {c: row.get(c) for c in passthrough_cols}
                merged.update(result)
                out_rows.append(merged)
            yield pd.DataFrame.from_records(out_rows)

    return fetch_batches


class _RowProvider:
    """record_provider backed by the row's joined payload columns; falls back
    to deterministic regeneration for off-row pages (favicon neighbors etc. —
    identical bytes by construction)."""

    def __init__(self, rec: dict, fabric_cfg: FabricConfig):
        self.rec = rec
        self.cfg = fabric_cfg

    def __call__(self, image_id: str) -> dict:
        if image_id == self.rec["image_id"] and self.rec.get("caption") is not None:
            return self.rec
        from httpz_spark.sources.fabric import image_record

        return image_record(image_id, self.cfg)
