"""Combined single-pass page parser == the reference model's separate
parsers (title / body_clean / favicon discovery) on adversarial HTML."""

from httpz_spark.functions.htmlx import parse_page
from httpz_spark.parity import refmodel as R

CASES = [
    "<html><head><title>Hello  World</title></head><body><p>text</p></body></html>",
    "<title>nested <b>tag</b></title><p>body</p>",          # title invalid
    "<title></title><p>x</p>",                               # empty title
    "<title>  \t </title><p>x</p>",                          # ws-only title
    "<p>no title</p><script>var x='<title>fake</title>';</script>",
    "<style>.a{}</style><noscript>ns</noscript><p>real</p>",
    '<link rel="ICON" href="/fav.ico"><link rel="icon" href="/second.ico">',
    '<link rel="shortcut icon" href="/si.ico">',
    '<link rel="icon"><link rel="icon" href="/later.ico">',  # first wins, no href
    '<a href="/x">x</a><a href="http://h.test/y">y</a><a>none</a>',
    "<title>one</title><title>two</title>",
    "broken <b<<>> html <title>t</title",
    "",
    "<script>unterminated",
    "<TITLE>upper case tag</TITLE><p>q</p>",
    '<div><title>deep title</title></div>',
]


def engine_title(html, content_type=None):
    if content_type and not any(
        x in content_type.lower() for x in ("text/html", "application/xhtml")
    ):
        return None
    page = parse_page(html)
    if page.title_raw is None:
        return None
    t = R.normalize_text(page.title_raw)
    return t[: R.TITLE_MAX_CHARS] if t else None


def engine_body_clean(html):
    if not html:
        return None
    page = parse_page(html)
    text = R.normalize_text(" ".join(page.text_parts))
    return text[: R.BODY_CLEAN_CHARS] if text else None


def test_title_parity():
    for html in CASES:
        assert engine_title(html) == R.parse_title(html), repr(html)
    assert engine_title(CASES[0], "application/json") is None
    assert engine_title(CASES[0], "text/html; charset=utf-8") == "Hello World"


def test_body_clean_parity():
    for html in CASES:
        assert engine_body_clean(html) == R.body_clean(html), repr(html)


def test_favicon_href_parity():
    for html in CASES:
        assert parse_page(html).favicon_href == R.find_favicon_href(html), repr(html)


def test_links():
    page = parse_page(CASES[9])
    assert page.hrefs == ["/x", "http://h.test/y"]
