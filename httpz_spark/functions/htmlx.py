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


def parse_page(html: str) -> PageParse:
    """Single-pass page parse; resilient (parse errors -> empty result)."""
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
