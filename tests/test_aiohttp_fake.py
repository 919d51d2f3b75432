"""Execute AiohttpTransport's real wiring under a FAKE ``aiohttp`` module.

aiohttp is absent in this container (env-forced), which previously left
``sources/transport.py:AiohttpTransport`` as complete-but-never-executed
code.  These tests monkeypatch a faithful miniature of the aiohttp surface
the transport touches — ClientTimeout, TCPConnector (recording its kwargs
and exposing ``_wrap_create_connection`` for the cert-capturing subclass),
ClientSession.request as an async context manager with redirect following
and aiohttp's history shape, and the exception hierarchy with the real
subclass relationships (ClientConnectorCertificateError < ClientSSLError <
ClientConnectorError < ClientError) — then drive session creation,
connector-kwargs consumption, fetch/fetch_many batching, the
contextvar-based cert capture path, redirect history shaping, and the
error-taxonomy boundary.  Semantics are asserted to match
AsyncioTransport's on equivalent exchanges (same Response shapes the
integration tests pin against a live TLS server in test_nettransport.py).
"""

from __future__ import annotations

import asyncio
import sys
import types
import urllib.parse

import pytest

from httpz_spark.config import ScanConfig
from httpz_spark.operators.fetch import scan_row_gen
from httpz_spark.sources.transport import TransportError

_REDIRECTS = {301, 302, 303, 307, 308}


def make_fake_aiohttp(routes, ssl_der=None):
    """A module object quacking like aiohttp for the transport's surface.

    ``routes``: url -> dict(status=, headers=, body=) or an exception
    instance to raise.  ``ssl_der``: DER bytes the fake connection's
    ssl_object hands to getpeercert(binary_form=True) for https urls.
    """
    mod = types.ModuleType("aiohttp")

    class ClientError(Exception):
        pass

    class ClientOSError(ClientError, OSError):
        pass

    class ClientConnectorError(ClientOSError):
        pass

    class ClientSSLError(ClientConnectorError):
        pass

    class ClientConnectorCertificateError(ClientSSLError):
        pass

    class ClientTimeout:
        def __init__(self, total=None):
            self.total = total

    class _FakeSSLObject:
        def getpeercert(self, binary_form=False):
            assert binary_form
            return ssl_der

    class _FakeTransport:
        def __init__(self, is_tls):
            self._is_tls = is_tls

        def get_extra_info(self, name):
            if name == "ssl_object" and self._is_tls and ssl_der is not None:
                return _FakeSSLObject()
            return None

    class TCPConnector:
        def __init__(self, **kwargs):
            self.kwargs = kwargs
            mod._connectors.append(self)

        async def _wrap_create_connection(self, *args, **kwargs):
            # the engine's _CertCapturingConnector overrides this and calls
            # super() — returning (transport, protocol) like aiohttp does
            is_tls = kwargs.get("_is_tls", False)
            return _FakeTransport(is_tls), object()

    class _Hist:
        def __init__(self, url):
            self.url = url

    class _FakeResponse:
        def __init__(self, url, status, headers, body, history):
            self.url = url
            self.status = status
            self.headers = dict(headers)
            self._body = body
            self.history = [_Hist(u) for u in history]
            ct = self.headers.get("Content-Type", "")
            self.charset = None
            for part in ct.split(";")[1:]:
                k, _, v = part.strip().partition("=")
                if k.lower() == "charset":
                    self.charset = v.lower()

        async def read(self):
            return self._body

    class _RequestCtx:
        def __init__(self, session, method, url, kw):
            self._session = session
            self._method = method
            self._url = url
            self._kw = kw

        async def __aenter__(self):
            sess = self._session
            mod._requests.append((self._method, self._url, dict(self._kw)))
            cur, hops = self._url, []
            # connection creation goes through the session's connector —
            # exactly where aiohttp's _wrap_create_connection runs, so the
            # cert-capturing subclass sees the calling task's contextvars
            await sess._connector._wrap_create_connection(
                _is_tls=cur.startswith("https://")
            )
            for _ in range(self._kw.get("max_redirects", 10) + 1):
                spec = routes.get(cur)
                if spec is None:
                    spec = {"status": 404, "headers": {}, "body": b""}
                if isinstance(spec, BaseException):
                    raise spec
                status = spec["status"]
                loc = spec.get("headers", {}).get("Location")
                if (self._kw.get("allow_redirects", True)
                        and status in _REDIRECTS and loc):
                    hops.append(cur)
                    cur = urllib.parse.urljoin(cur, loc)
                    continue
                return _FakeResponse(cur, status, spec.get("headers", {}),
                                     spec.get("body", b""), hops)
            raise ClientError("too many redirects")

        async def __aexit__(self, *exc):
            return False

    class ClientSession:
        def __init__(self, connector=None, timeout=None):
            self._connector = connector
            self._timeout = timeout
            self.closed = False
            mod._sessions.append(self)

        def request(self, method, url, **kw):
            return _RequestCtx(self, method, url, kw)

        async def close(self):
            self.closed = True

    mod.ClientError = ClientError
    mod.ClientOSError = ClientOSError
    mod.ClientConnectorError = ClientConnectorError
    mod.ClientSSLError = ClientSSLError
    mod.ClientConnectorCertificateError = ClientConnectorCertificateError
    mod.ClientTimeout = ClientTimeout
    mod.TCPConnector = TCPConnector
    mod.ClientSession = ClientSession
    mod._connectors = []
    mod._sessions = []
    mod._requests = []
    return mod


@pytest.fixture
def fake_aiohttp(monkeypatch):
    def install(routes, ssl_der=None):
        mod = make_fake_aiohttp(routes, ssl_der)
        monkeypatch.setitem(sys.modules, "aiohttp", mod)
        return mod

    return install


def _mk(fake, routes, ssl_der=None, **kw):
    from httpz_spark.sources.transport import AiohttpTransport

    mod = fake(routes, ssl_der)
    return mod, AiohttpTransport(**kw)


def test_session_and_connector_hygiene_wiring(fake_aiohttp):
    mod, t = _mk(fake_aiohttp, {}, concurrent_limit=40)
    assert len(mod._sessions) == 1 and len(mod._connectors) == 1
    got = mod._connectors[0].kwargs
    # the reference's hygiene flags, end-to-end through the constructor
    # (scanner.py:149-156)
    assert got == {"ssl": False, "limit": 80, "limit_per_host": 0,
                   "ttl_dns_cache": 300, "use_dns_cache": True,
                   "force_close": True}
    assert mod._sessions[0]._timeout.total == 5.0
    t.close()
    assert mod._sessions[0].closed
    assert t._loop.is_closed()


def test_fetch_response_and_redirect_history(fake_aiohttp):
    routes = {
        "https://a.test/": {
            "status": 302, "headers": {"Location": "/hop2"}, "body": b""},
        "https://a.test/hop2": {
            "status": 200,
            "headers": {"Content-Type": "text/html; charset=utf-8"},
            "body": b"<html><title>T</title></html>"},
    }
    mod, t = _mk(fake_aiohttp, routes)
    resp = t.fetch("https://a.test/", "https")
    assert resp.status == 200
    assert resp.body.startswith(b"<html>")
    assert resp.charset == "utf-8"
    # aiohttp history shape -> engine shape: intermediates + final
    # (identical to AsyncioTransport's, test_nettransport.py)
    assert resp.history == ["https://a.test/", "https://a.test/hop2"]
    assert resp.url == "https://a.test/hop2"
    # redirects off -> the 3xx itself, empty history
    resp2 = t.fetch("https://a.test/", "https", follow_redirects=False)
    assert resp2.status == 302 and resp2.history == []
    # request kwargs forwarded
    m, u, kw = mod._requests[0]
    assert m == "GET" and kw["allow_redirects"] is True
    t.close()


def test_error_taxonomy_through_fake_hierarchy(fake_aiohttp):
    # routes raise the INSTALLED module's own exception classes (the ones
    # classify_exception will import), so fill the dict after install
    holder = {}
    mod = fake_aiohttp(holder)
    holder.update({
        "https://cert.test/": mod.ClientConnectorCertificateError("bad cert"),
        "https://ssl.test/": mod.ClientSSLError("handshake"),
        "https://conn.test/": mod.ClientConnectorError("refused"),
        "https://http.test/": mod.ClientError("protocol"),
        "https://slow.test/": asyncio.TimeoutError(),
        "https://odd.test/": ValueError("weird"),
    })
    from httpz_spark.sources.transport import AiohttpTransport

    t = AiohttpTransport()
    expect = {"cert": "CERT", "ssl": "SSL", "conn": "CONN",
              "http": "HTTP", "slow": "TIMEOUT", "odd": "UNKNOWN"}
    for host, err_type in expect.items():
        with pytest.raises(TransportError) as ei:
            t.fetch(f"https://{host}.test/", "https")
        assert ei.value.error_type == err_type, host
    t.close()


def test_cert_capture_via_connector_subclass(fake_aiohttp):
    der = b"\x30\x82fake-der-bytes"
    routes = {"https://a.test/": {"status": 200, "headers": {}, "body": b"ok"},
              "http://b.test/": {"status": 200, "headers": {}, "body": b"ok"}}
    mod, t = _mk(fake_aiohttp, routes, ssl_der=der, capture_certs=True)
    # capture_certs installs the _CertCapturingConnector SUBCLASS of the
    # (fake) TCPConnector — its override must have run and grabbed the
    # handshake ssl_object into the request's contextvar bucket
    assert type(mod._connectors[0]).__name__ == "_CertCapturingConnector"
    resp = t.fetch("https://a.test/", "https")
    assert resp.cert_der == der
    # http requests never consult the bucket
    resp2 = t.fetch("http://b.test/", "http")
    assert resp2.cert_der is None
    t.close()


def test_fetch_many_batched_scan_rows(fake_aiohttp):
    """Whole Arrow-batch driving: scan_row_gen state machines through
    fetch_many, incl. protocol fallback on a CONN failure."""
    holder = {}
    mod = fake_aiohttp(holder)
    holder.update({
        "https://ok.test": {
            "status": 200,
            "headers": {"Content-Type": "text/html; charset=utf-8",
                        "Content-Length": "34"},
            "body": b"<html><title>OK page</title></html>"},
        # https fails at connect -> state machine falls back to http
        "https://fallback.test": mod.ClientConnectorError("refused"),
        "http://fallback.test": {
            "status": 200,
            "headers": {"Content-Type": "text/html"},
            "body": b"<html><title>Plain</title></html>"},
        "https://gone.test": mod.ClientConnectorError("refused"),
        "http://gone.test": mod.ClientConnectorError("refused"),
    })
    from httpz_spark.sources.transport import AiohttpTransport

    t = AiohttpTransport(timeout_s=2.0, concurrent_limit=8)
    cfg = ScanConfig(fetch_title=True, fetch_content_type=True, retries=0)
    gens = [scan_row_gen(h, None, "https", "http", cfg, {}, None)
            for h in ["ok.test", "fallback.test", "gone.test"]]
    ok, fb, gone = t.fetch_many(gens)
    assert ok["status"] == 200 and ok["protocol"] == "https"
    assert ok["title"] == "OK page"
    assert fb["status"] == 200 and fb["protocol"] == "http"
    assert fb["title"] == "Plain"
    assert gone["status"] == -1 and gone["error_type"] == "CONN"
    t.close()
