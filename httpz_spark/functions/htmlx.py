"""Engine-only HTML helpers (no reference analogue).

Link discovery feeds the frontier: the reference is a one-shot domain
scanner (no link following), but the north_rule's crawler enqueues
discovered URLs into the next wave.  Parsing is stdlib HTMLParser — bs4 is
unavailable here; semantics are engine-defined, not parity-bound.
"""

from __future__ import annotations

import urllib.parse
from html.parser import HTMLParser


class PageParse:
    """Result of one combined parse pass."""

    __slots__ = ("title_raw", "text_parts", "favicon_href", "hrefs")

    def __init__(self, title_raw, text_parts, favicon_href, hrefs):
        self.title_raw = title_raw      # None unless a single-text-run <title>
        self.text_parts = text_parts    # data outside script/style/noscript
        self.favicon_href = favicon_href
        self.hrefs = hrefs


class _PageParser(HTMLParser):
    """ONE streaming pass extracting everything the fetch stage needs:
    title (bs4 ``soup.title.string`` semantics: None when the title has
    nested markup — parsers.py:98), body text with script/style/noscript
    decomposed (parsers.py:136-139), first <link rel=icon> href
    (parsers.py:218-225), and all <a href> outlinks.  Replaces 3-4
    separate parser passes per page — the fetch hot path's dominant cost.
    Semantics equality vs the reference model's individual parsers is
    enforced by the parity suite."""

    SKIP = {"script", "style", "noscript"}

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.in_title = False
        self.title_done = False
        self.title_invalid = False
        self.title_parts: list[str] = []
        self.skip_depth = 0
        self.text_parts: list[str] = []
        self.favicon_href: str | None = None
        self.favicon_done = False   # first rel=icon link wins, even with no
                                    # href (the bs4 loop breaks — parsers.py:223)
        self.hrefs: list[str] = []

    def handle_starttag(self, tag, attrs):
        if self.in_title and not self.title_done:
            self.title_invalid = True
        if tag == "title" and not self.title_done and not self.in_title:
            self.in_title = True
        elif tag in self.SKIP:
            self.skip_depth += 1
        elif tag == "link" and not self.favicon_done:
            d = dict(attrs)
            rels = (d.get("rel") or "").split()
            if any(r.lower() == "icon" for r in rels):
                self.favicon_href = d.get("href")
                self.favicon_done = True
        elif tag == "a":
            href = dict(attrs).get("href")
            if href:
                self.hrefs.append(href)

    def handle_endtag(self, tag):
        if self.in_title and tag == "title":
            self.in_title = False
            self.title_done = True
        elif tag in self.SKIP and self.skip_depth > 0:
            self.skip_depth -= 1

    def handle_data(self, data):
        if self.in_title and not self.title_done:
            self.title_parts.append(data)
        if self.skip_depth == 0 and data:
            self.text_parts.append(data)


def parse_page_htmlparser(html: str) -> PageParse:
    """The reference semantics implementation (stdlib HTMLParser) — used
    directly when the fast scanner bails, and as the equivalence oracle in
    tests/test_htmlx.py."""
    p = _PageParser()
    try:
        p.feed(html)
        p.close()
    except Exception:
        return PageParse(None, [], None, [])
    title_raw = None
    if p.title_parts and not p.title_invalid:
        title_raw = "".join(p.title_parts)
    return PageParse(title_raw, p.text_parts, p.favicon_href, p.hrefs)


# --------------------------------------------------------------------------
# fast path: regex tag scanner (HTMLParser dominates the fetch hot path at
# ~44% of per-URL CPU).  Takes over ONLY for documents with no character
# references / comments / declarations / PIs and no stray '<'; anything
# else falls back to HTMLParser.  Equivalence on both fabric pages and
# adversarial inputs is property-tested (tests/test_htmlx.py).
# --------------------------------------------------------------------------

import re

_TAG_RE = re.compile(r"""<(/?)([a-zA-Z][a-zA-Z0-9-]*)((?:"[^"]*"|'[^']*'|[^<>"'])*)>""")
_ATTR_RE = re.compile(
    r"""([a-zA-Z_][-a-zA-Z0-9_:.]*)\s*(?:=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]+)))?"""
)
# only tag bodies of this exact shape (quoted attrs, optional final '/') are
# handled by the fast path — unquoted values / stray junk diverge from
# HTMLParser's tolerant recovery, so they fall back to it
_SIMPLE_BODY_RE = re.compile(
    r"""(?:\s+[a-zA-Z_][-a-zA-Z0-9_:.]*(?:\s*=\s*(?:"[^"]*"|'[^']*'))?)*\s*(/?)$"""
)
_CDATA_TAGS = ("script", "style")  # HTMLParser parses these in CDATA mode
# HTMLParser.set_cdata_mode's `interesting` regex verbatim: CDATA content
# ends ONLY at '</' + optional ws + tag + optional ws + '>' — '</scripts>'
# does NOT close, '</ script >' DOES (divergence found by round-2 review)
_CDATA_CLOSE = {t: re.compile(r"</\s*%s\s*>" % t, re.IGNORECASE) for t in _CDATA_TAGS}


def _attrs_of(body: str) -> dict:
    return {
        m.group(1).lower(): (
            m.group(2) if m.group(2) is not None
            else m.group(3) if m.group(3) is not None
            else m.group(4)
        )
        for m in _ATTR_RE.finditer(body)
    }


def _parse_page_fast(html: str) -> PageParse | None:
    """Regex scan; returns None to request the HTMLParser fallback."""
    if "&" in html or "<!" in html or "<?" in html:
        return None  # charrefs / comments / doctype / PI -> exact parser

    in_title = False
    title_done = False
    title_invalid = False
    title_parts: list = []
    noscript_depth = 0
    text_parts: list = []
    favicon_href = None
    favicon_done = False
    hrefs: list = []

    pos = 0
    n = len(html)
    while pos < n:
        m = _TAG_RE.search(html, pos)
        start = m.start() if m else n
        if start > pos:
            data = html[pos:start]
            if "<" in data:
                return None  # stray '<' -> HTMLParser's recovery rules
            if in_title and not title_done:
                title_parts.append(data)
            if noscript_depth == 0:
                text_parts.append(data)
        if m is None:
            break
        closing, tag, body = m.group(1), m.group(2).lower(), m.group(3)
        pos = m.end()
        if closing:
            if body.strip():
                return None  # attributes on an end tag -> exact parser
            if in_title and tag == "title":
                in_title = False
                title_done = True
            elif tag == "noscript" and noscript_depth > 0:
                noscript_depth -= 1
            continue
        bm = _SIMPLE_BODY_RE.fullmatch(body)
        if bm is None:
            return None  # unquoted/odd attrs -> HTMLParser's tolerant rules
        selfclosing = bm.group(1) == "/"
        # start tag (handle_starttag semantics; startendtag = start + end)
        if in_title and not title_done:
            title_invalid = True
        if tag == "title" and not title_done and not in_title:
            if selfclosing:
                title_done = True  # <title/> = start+end (handle_startendtag)
            else:
                in_title = True
        elif tag in _CDATA_TAGS:
            if not selfclosing:
                cm = _CDATA_CLOSE[tag].search(html, pos)
                if cm is None:
                    break  # unterminated CDATA: rest is (skipped) content
                pos = cm.end()
        elif tag == "noscript":
            if not selfclosing:
                noscript_depth += 1
        elif tag == "link" and not favicon_done:
            d = _attrs_of(body)
            rels = (d.get("rel") or "").split()
            if any(r.lower() == "icon" for r in rels):
                favicon_href = d.get("href")
                favicon_done = True
        elif tag == "a":
            href = _attrs_of(body).get("href")
            if href:
                hrefs.append(href)

    title_raw = None
    if title_parts and not title_invalid:
        title_raw = "".join(title_parts)
    return PageParse(title_raw, text_parts, favicon_href, hrefs)


def parse_page(html: str) -> PageParse:
    """Single-pass page parse; resilient (parse errors -> empty result).
    Dispatches to the regex fast path when safe, HTMLParser otherwise."""
    try:
        fast = _parse_page_fast(html)
    except Exception:
        fast = None
    if fast is not None:
        return fast
    return parse_page_htmlparser(html)


class _HrefCollector(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.hrefs: list[str] = []

    def handle_starttag(self, tag, attrs):
        if tag == "a":
            d = dict(attrs)
            href = d.get("href")
            if href:
                self.hrefs.append(href)


def extract_links(html: str, base_url: str) -> list:
    """All <a href> targets resolved against base_url; http(s) only."""
    p = _HrefCollector()
    try:
        p.feed(html)
        p.close()
    except Exception:
        return []
    out = []
    for href in p.hrefs:
        absu = urllib.parse.urljoin(base_url, href)
        if absu.startswith(("http://", "https://")):
            out.append(absu)
    return out
