"""The transport seam — how the fetch stage talks to "the network".

The fetch stage (:mod:`httpz_spark.operators.fetch`) is transport-agnostic:
it consumes the :class:`Transport` protocol below.  Two implementations:

* :class:`httpz_spark.sources.fabric.FabricTransport` — the deterministic
  synthetic web used for tests/parity/benchmarks in this sandbox.
* :class:`AiohttpTransport` — a real-network adapter mirroring the
  reference's aiohttp fetch (``/root/reference/httpz_scanner/scanner.py:
  206-309``).  aiohttp is not installed in this container, so the class is
  import-gated; its exception→taxonomy mapping (:func:`classify_exception`,
  mirroring ``scanner.py:189-203``) is pure logic and fully unit-tested
  against synthetic exception classes (tests/test_error_taxonomy.py).

Contract (duck-typed; both transports satisfy it):

``fetch(url, protocol, *, attempt, follow_redirects, max_redirects, method,
request_headers) -> response`` where the response has ``.url .status
.headers .body .cert_der .history .charset .latency_ms`` attributes, and
failures raise :class:`TransportError` carrying the reference's error
taxonomy (TIMEOUT / CERT / SSL / CONN / HTTP / UNKNOWN — transient-vs-
fallback retry policy is the fetch stage's job, not the transport's).
"""

from __future__ import annotations

import time


class TransportError(Exception):
    """Fetch failure carrying the reference error taxonomy
    (scanner.py:189-203 classes + message templates)."""

    def __init__(self, error_type: str, message: str):
        super().__init__(message)
        self.error_type = error_type
        self.message = message


class Response:
    """Minimal transport response (both FabricTransport and
    AiohttpTransport return this shape)."""

    __slots__ = ("url", "status", "headers", "body", "cert_der", "history",
                 "charset", "latency_ms")

    def __init__(self, url, status, headers, body, cert_der, history,
                 charset, latency_ms):
        self.url = url
        self.status = status
        self.headers = headers
        self.body = body
        self.cert_der = cert_der
        self.history = history
        self.charset = charset
        self.latency_ms = latency_ms


def classify_exception(exc: BaseException, classes: dict | None = None):
    """Map a client exception to ``(error_type, message)`` — the exact
    decision ladder of ``scanner.py:189-203`` (order matters: CERT is a
    subclass of SSL is a subclass of CONN in aiohttp's hierarchy, so the
    most specific class must win).

    ``classes`` maps the five rung names to exception types; by default the
    aiohttp hierarchy is used (import-gated).  Tests inject synthetic
    classes with the same subclass relationships.
    """
    if classes is None:
        classes = _aiohttp_classes()
    if isinstance(exc, classes["timeout"]):
        return "TIMEOUT", "Connection timed out"
    if isinstance(exc, classes["cert"]):
        return "CERT", f"Certificate Error: {exc}"
    if isinstance(exc, classes["ssl"]):
        return "SSL", f"SSL Error: {exc}"
    if isinstance(exc, classes["conn"]):
        return "CONN", f"Connection Failed: {exc}"
    if isinstance(exc, classes["client"]):
        return "HTTP", f"HTTP Error: {exc.__class__.__name__}: {exc}"
    return "UNKNOWN", f"Error: {exc.__class__.__name__}: {exc}"


def _aiohttp_classes() -> dict:
    import asyncio

    import aiohttp  # import-gated: absent in this container

    return {
        "timeout": asyncio.TimeoutError,
        "cert": aiohttp.ClientConnectorCertificateError,
        "ssl": aiohttp.ClientSSLError,
        "conn": aiohttp.ClientConnectorError,
        "client": aiohttp.ClientError,
    }


class AiohttpTransport:
    """Real-network transport — scanner.py:206-309's fetch re-shaped to the
    Transport contract.  One instance per executor task; requests run on a
    private event loop (mapInPandas workers are plain sync python).

    Import-gated: constructing it raises ImportError in environments
    without aiohttp (this container), but the class exists so production
    deploys swap it in via ``make_fetch_stage(transport_factory=...)``
    without touching the engine.
    """

    def __init__(self, timeout_s: float = 5.0, capture_certs: bool = False):
        import asyncio

        import aiohttp

        self._aiohttp = aiohttp
        self._timeout = aiohttp.ClientTimeout(total=timeout_s)
        self._loop = asyncio.new_event_loop()
        self._capture_certs = capture_certs
        self._session = self._loop.run_until_complete(self._mk_session())

    async def _mk_session(self):
        connector = self._aiohttp.TCPConnector(ssl=False)
        return self._aiohttp.ClientSession(
            connector=connector, timeout=self._timeout
        )

    def fetch(self, url, protocol, *, attempt=0, follow_redirects=True,
              max_redirects=10, method="GET", request_headers=None):
        try:
            return self._loop.run_until_complete(
                self._fetch_async(url, follow_redirects, max_redirects,
                                  method, request_headers)
            )
        except TransportError:
            raise
        except BaseException as exc:  # noqa: BLE001 — taxonomy boundary
            error_type, message = classify_exception(exc)
            raise TransportError(error_type, message) from exc

    async def _fetch_async(self, url, follow_redirects, max_redirects,
                           method, request_headers):
        t0 = time.monotonic()
        async with self._session.request(
            method, url, headers=request_headers or {},
            allow_redirects=follow_redirects, max_redirects=max_redirects,
        ) as resp:
            body = await resp.read()
            charset = resp.charset
            history = [str(h.url) for h in resp.history]
            if history:
                history = history + [str(resp.url)]
            return Response(
                url=str(resp.url), status=resp.status,
                headers=dict(resp.headers), body=body,
                cert_der=None,  # cert capture needs a custom connector
                history=history, charset=charset,
                latency_ms=(time.monotonic() - t0) * 1000.0,
            )

    def close(self):
        self._loop.run_until_complete(self._session.close())
        self._loop.close()
