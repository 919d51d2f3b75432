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


def test_resolve_href_matches_urljoin():
    import urllib.parse

    from httpz_spark.operators.fetch import resolve_href

    base = "https://h.test/a/page"
    for href in [
        "/x", "/x/y?q=1#f", "/a/../b", "/a/./b", "/..", "/.", "/a.b/c",
        "/a/b/../../c", "rel", "../up", "//other.test/p", "?q=2", "#frag",
        "http://abs.test/z", "https://abs.test/z",
    ]:
        assert resolve_href(base, href) == urllib.parse.urljoin(base, href), href


# ---------------------------------------------------------------------------
# fast-path scanner == HTMLParser equivalence (the dispatcher may route to a
# regex scanner; its output must be indistinguishable from the exact parser)
# ---------------------------------------------------------------------------

def _pp_tuple(p):
    return (p.title_raw, p.text_parts, p.favicon_href, p.hrefs)


def _assert_equivalent(html):
    from httpz_spark.functions.htmlx import parse_page, parse_page_htmlparser

    got = _pp_tuple(parse_page(html))
    want = _pp_tuple(parse_page_htmlparser(html))
    assert got == want, html[:200]


def test_fast_parser_equivalent_on_fabric_corpus():
    from httpz_spark.sources import fabric as FB

    world = FB.FabricConfig(n_images=256, n_hosts=16)
    for i in range(256):
        iid = FB.image_id_at(i)
        host = FB.host_for_image(iid, world)
        rec = {
            "image_id": iid, "caption": FB.caption_for(iid, world),
            "w": 40, "h": 30, "fmt": "png",
        }
        _assert_equivalent(FB.page_html(host, rec, world).decode("utf-8"))


ADVERSARIAL = [
    "",
    "plain text only",
    "<title>ok</title>",
    "<title>bad <b>nested</b></title>",
    "<title/><title>second</title>",
    "<title>first</title><title>second</title>",
    "<title>unterminated",
    "<script>var x = '<title>not a title</title>';</script><title>t</title>",
    "<script>no closer",
    "<STYLE>body{}</STYLE>after",
    "<noscript><p>inner</p></noscript>tail",
    "<noscript><noscript>deep</noscript>mid</noscript>out",
    "<link rel=\"icon\" href=\"/f.ico\"><link rel=\"icon\" href=\"/g.ico\">",
    "<link rel=\"ICON SHORTCUT\" href=\"/f.ico\">",
    "<link rel=\"stylesheet\" href=\"/s.css\"><link rel=\"icon\" href=\"/f.ico\">",
    "<link rel=\"icon\">",  # first icon link wins even with no href
    "<a href=\"/x\">x</a><a>nohref</a><a href=\"\">empty</a>",
    "<a href='/single'>q</a>",
    "<a href=/unquoted>u</a>",     # -> fallback path
    "<a href=\"/a&amp;b\">amp</a>",  # charref -> fallback path
    "<!-- comment --><title>t</title>",  # comment -> fallback
    "<!DOCTYPE html><p>x</p>",      # declaration -> fallback
    "<?php echo ?><p>x</p>",        # PI -> fallback
    "a < b and c > d",              # stray '<' -> fallback
    "<br/><br /><img src=\"x\"/>",
    "<a href=\"/x\"/>self</a>",
    "<b attr=\"va>lue\">gt in attr</b>",
    "<p>text</p  >",
    "<title></title>",
    "<title> </title>",
    "<div\ndata-x=\"1\">multiline tag</div>",
    "<a href=\"/x\" href=\"/y\">dup attr</a>",
    "<EM>UPPER TAGS</EM><A HREF=\"/UP\">U</A>",
    # CDATA close-delimiter edges (round-2 review): HTMLParser's interesting
    # regex is r'</\s*tag\s*>' — '</scripts>' does NOT close, '</ script>'
    # and '</script\t>' DO
    '<script>x</scripts><a href="/y">',
    '<script>x</ script><a href="/y">',
    '<script>x</script\t><a href="/y">',
    '<script>x</script foo></script><a href="/z">',
    '<style>a{}</ STYLE >tail<a href="/y">y</a>',
    '<script>a</scriptz></script z></script><a href="/w">w</a>',
    # round-3 stretch: close-tags-with-attributes, spaced variants, and
    # CDATA-lookalike nesting
    '<script>x</script foo="</script>"></script><a href="/q">q</a>',
    '<script>x</  script><a href="/y">',
    '<script>x</\nscript\n><a href="/y">',
    '<script>x</scr ipt></script><a href="/y">',
    '<script>var s = "</scrip" + "t>";</script><title>after</title>',
    '<script><script>inner</script><a href="/y">',   # no CDATA nesting
    '<script>/* </style> */</script><style>b{}</style><title>t</title>',
    '<style><!-- </style --></style><a href="/y">y</a>',
    '<script src="/x.js"/></script><title>selfclose script</title>',
    '<title>t1<script></title></script>t2</title>',
    '<noscript><script>x</script></noscript><a href="/y">y</a>',
    '<script>x</SCRIPT><a href="/u">u</a>',
    '<script>x</ScRiPt ><a href="/u">u</a>',
    '<script>"</s" + "cript>"</script' + " \t\n" + '><a href="/v">v</a>',
    '<script></script x</script><a href="/w">w</a>',
    '<style>@import "</style>";</style><link rel="icon" href="/i.ico">',
]


def test_fast_parser_equivalent_on_adversarial_inputs():
    for html in ADVERSARIAL:
        _assert_equivalent(html)


def test_fast_parser_equivalent_on_seeded_fuzz_corpus():
    """Deterministic fragment-shuffle fuzzer: a few hundred documents built
    from the pieces that stress the CDATA fast path (close-tag variants,
    attribute quoting, nesting lookalikes) must all parse identically to
    the HTMLParser reference model."""
    import random

    frags = [
        "<title>t{i}</title>", "<script>var a{i} = '<x>';", "</script>",
        "</script {i}>", "</ script>", "</script\t>", "</scripts>",
        "<style>.c{i}{{color:red}}", "</style>", "</ STYLE >",
        '<a href="/p{i}">l</a>', "<a href=/u{i}>u</a>", "plain {i} text",
        '<link rel="icon" href="/f{i}.ico">', "<noscript>n{i}</noscript>",
        "<!-- c{i} -->", "<b attr='v>{i}'>g</b>", "<br/>", "&amp; ent",
        "a < {i} b", "</title>", "<title>open{i}",
    ]
    rng = random.Random(4242)
    for _ in range(300):
        n = rng.randint(1, 12)
        html = "".join(
            rng.choice(frags).replace("{i}", str(rng.randint(0, 9)))
            for _ in range(n)
        )
        _assert_equivalent(html)


def test_fast_path_actually_taken_on_fabric_pages():
    # guard against silently losing the speedup: fabric pages must route to
    # the regex scanner, not the fallback
    from httpz_spark.functions.htmlx import _parse_page_fast
    from httpz_spark.sources import fabric as FB

    world = FB.FabricConfig(n_images=8, n_hosts=4)
    iid = FB.image_id_at(1)
    rec = {"image_id": iid, "caption": FB.caption_for(iid, world),
           "w": 40, "h": 30, "fmt": "png"}
    html = FB.page_html("h1.test", rec, world).decode("utf-8")
    assert _parse_page_fast(html) is not None
