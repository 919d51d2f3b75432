"""Behavioral model of the reference *scan state machine* over the fabric.

This is the "reference side" of the golden parity harness (SURVEY.md §5.2).
The real httpz cannot run here (its deps are absent), so this module
re-enacts its control flow step by step — retries, protocol fallback, error
taxonomy, CNAME walk, DNS overlap, match/exclude filtering, shard selection —
with every branch cited to ``/root/reference/httpz_scanner/scanner.py``.
It runs single-threaded on the driver against the same
:class:`~httpz_spark.sources.fabric.FabricTransport` the engine's fetch UDF
uses, under the **pinned deterministic scheduler**: domains are processed in
(priority, url_hash) order, which is also the engine's defined crawl order —
the reference's real completion order (asyncio FIRST_COMPLETED,
scanner.py:440) is not reproducible, so both sides pin to this order
(SURVEY.md §7 hard part 1).
"""

from __future__ import annotations

import urllib.parse

from httpz_spark.config import ScanConfig
from httpz_spark.functions.hashing import hash64_low
from httpz_spark.functions.tlsx import parse_cert_der
from httpz_spark.parity import refmodel as R
from httpz_spark.sources.fabric import FabricError, FabricTransport


def _err_result(domain: str, protocol: str, err_type: str, message: str) -> dict:
    # scanner.py:178-186
    return {
        "domain": domain,
        "protocol": protocol,
        "status": -1,
        "error": message,
        "error_type": err_type,
    }


def _check_url(
    transport: FabricTransport, url: str, protocol: str, domain: str,
    cfg: ScanConfig, attempt: int,
) -> dict:
    """One attempt — models scanner.py:206-309.  UA selection models
    scanner.py:209 with the seeded pick both sides pin to (the reference's
    random.choice is non-reproducible; SURVEY §2 A24)."""
    from httpz_spark.functions.ua import ua_for

    headers = {"User-Agent": ua_for(url, attempt, cfg.ua_seed)}
    if cfg.custom_headers:
        headers.update(dict(cfg.custom_headers))  # scanner.py:210
    try:
        resp = transport.fetch(
            url, protocol, attempt=attempt,
            follow_redirects=cfg.follow_redirects,
            max_redirects=cfg.max_redirects,
            method="POST" if cfg.post_data is not None else "GET",  # scanner.py:212
            request_headers=headers,
        )
    except FabricError as e:
        return _err_result(domain, protocol, e.error_type, e.message)

    result = {
        "domain": domain,
        "url": resp.url,
        "status": resp.status,
        "protocol": protocol,
        "_latency_ms": resp.latency_ms,
    }
    if cfg.fetch_headers:
        result["response_headers"] = dict(resp.headers)
    if cfg.fetch_content_type:
        result["content_type"] = resp.headers.get("Content-Type")
    if cfg.fetch_content_length:
        cl = resp.headers.get("Content-Length")
        if cl is not None:
            try:
                result["content_length"] = int(cl)
            except ValueError:
                result["content_length"] = cl  # int/str union, scanner.py:246-252
    if resp.history:
        result["redirect_chain"] = list(resp.history)  # history + final, scanner.py:254-255
    if cfg.fetch_tls and protocol == "https":
        cert = parse_cert_der(resp.cert_der)
        if cert:
            result["tls"] = cert

    raw_body = None
    if cfg.needs_body:
        raw_body = resp.body[: R.MAX_BODY_BYTES]  # read cap, scanner.py:268

    if raw_body is not None:
        encoding = resp.charset or "utf-8"  # scanner.py:274
        if cfg.fetch_body:
            result["body_preview"] = R.body_preview(raw_body, encoding=encoding)
        try:
            html_text = raw_body.decode(encoding, errors="replace")
        except Exception:
            # unknown codec -> utf-8 fallback (scanner.py:281-283)
            html_text = raw_body.decode("utf-8", errors="replace")
        if cfg.fetch_body:
            result["body_clean"] = R.body_clean(html_text)
        if cfg.fetch_title:
            title = R.parse_title(html_text, resp.headers.get("Content-Type"))
            if title:
                result["title"] = title
        if cfg.fetch_favicon:
            fav = _favicon_hash(transport, resp.url, html_text, protocol, cfg)
            if fav:
                result["favicon_hash"] = fav
    return result


def _favicon_hash(transport, final_url, html_text, protocol, cfg) -> str | None:
    """Models parsers.py:205-254 over the fabric (second GET)."""
    parsed = urllib.parse.urlparse(final_url)
    base = f"{parsed.scheme}://{parsed.netloc}"
    href = R.find_favicon_href(html_text) or "/favicon.ico"
    favicon_url = urllib.parse.urljoin(base, href)
    try:
        resp = transport.fetch(
            favicon_url, protocol, attempt=0,
            follow_redirects=True, max_redirects=cfg.max_redirects,
        )
    except FabricError:
        return None  # exceptions swallowed, parsers.py:252-254
    if resp.status != 200:
        return None
    return R.favicon_hash(resp.body)


def _check_url_with_retries(transport, url, protocol, domain, cfg) -> dict:
    """Models scanner.py:312-326: 1+retries attempts, transient-only,
    linear backoff (simulated as latency, no real sleep)."""
    attempts = 1 + max(0, cfg.retries)
    last = None
    total_latency = 0.0
    for attempt in range(attempts):
        result = _check_url(transport, url, protocol, domain, cfg, attempt)
        total_latency += result.get("_latency_ms", 0.0) or 0.0
        result["_latency_ms"] = total_latency
        if result.get("status", -1) >= 0:
            return result
        last = result
        if result.get("error_type") not in R.TRANSIENT_ERROR_TYPES:
            return result
        if attempt < attempts - 1:
            total_latency += cfg.retry_backoff * 1000.0 * (attempt + 1)
    return last


def check_domain(transport, domain: str, cfg: ScanConfig, dns_map: dict, cname_targets: dict) -> dict:
    """Models scanner.py:329-379."""
    base_domain, port, protocols = R.parse_domain_url(domain)
    original_domain = base_domain

    cname_chain = None
    scan_target = base_domain
    if cfg.fetch_cname:
        chain = R.resolve_cname_chain(base_domain, cname_targets)
        if len(chain) > 1:
            cname_chain = chain
            scan_target = chain[-1]

    last_error = None
    success = None
    total_latency = 0.0  # accumulates across protocol fallbacks (same
    # accounting as the engine's _scan_row, so both sides simulate the
    # identical completion clock)
    for protocol in protocols:
        url = f"{protocol}://{scan_target}"
        if port:
            url += f":{port}"
        result = _check_url_with_retries(transport, url, protocol, original_domain, cfg)
        total_latency += result.get("_latency_ms", 0.0) or 0.0
        result["_latency_ms"] = total_latency
        if result.get("status", -1) >= 0:
            success = result
            break
        last_error = result
        if result.get("error_type") not in R.FALLBACK_ERROR_TYPES:
            break

    final = success if success is not None else last_error

    if cname_chain is not None:
        final["cname_chain"] = cname_chain
    if cfg.fetch_ips:
        ips = R.resolve_ips(scan_target, dns_map)
        if ips:
            final["ips"] = ips
    return final


def completion_order(latencies: list, concurrency: int) -> list:
    """Deterministic model of the asyncio pump's completion order
    (scanner.py:430-440): tasks admitted in input order up to
    ``concurrency`` in flight; task i admitted at the completion time of
    the task whose slot it takes; finishes at admit + latency; FIRST_COMPLETED
    pops by (finish_time, admission_index).  Returns admission indices in
    completion order."""
    import heapq

    n = len(latencies)
    heap = []  # (finish_time, idx)
    out = []
    nxt = 0
    while nxt < min(concurrency, n):
        heapq.heappush(heap, (float(latencies[nxt]), nxt))
        nxt += 1
    while heap:
        finish, idx = heapq.heappop(heap)
        out.append(idx)
        if nxt < n:
            heapq.heappush(heap, (finish + float(latencies[nxt]), nxt))
            nxt += 1
    return out


def scan(
    lines: list,
    transport: FabricTransport,
    cfg: ScanConfig,
    dns_map: dict,
    cname_targets: dict,
    keep_latency: bool = False,
) -> list:
    """Full scan under the pinned deterministic scheduler.

    Input handling models utils.py:172-238 (strip, blank-skip, shard modulo
    counting blanks).  Domains are admitted in INPUT ORDER (the producer
    queue is FIFO, scanner.py:399-407) and results are yielded in the
    completion order of the simulated FIRST_COMPLETED pump over the
    fabric's deterministic latencies — the reference's real completion
    order is wall-clock (irreproducible); both parity sides pin to this
    simulation (SURVEY.md §7 hard part 1).  match/exclude filters applied
    post-scan in completion order (scanner.py:450-453).
    """
    domains = R.input_lines(lines, cfg.shard)
    results = []
    for domain in domains:
        try:
            result = check_domain(transport, domain, cfg, dns_map, cname_targets)
        except Exception as e:  # scanner.py:409-414
            result = _err_result(domain, "unknown", "PROCESS", f"{e.__class__.__name__}: {e}")
        if result is None:  # scanner.py:447-448
            result = _err_result(domain, "unknown", "NO_RESPONSE", "No response from either protocol")
        results.append(result)

    order = completion_order(
        [r.get("_latency_ms", 0.0) or 0.0 for r in results], cfg.concurrent_limit
    )
    out = []
    for idx in order:
        result = results[idx]
        if cfg.match_codes is not None and result.get("status") not in cfg.match_codes:
            continue
        if cfg.exclude_codes is not None and result.get("status") in cfg.exclude_codes:
            continue
        if not keep_latency:
            result.pop("_latency_ms", None)
        out.append(result)
    return out
