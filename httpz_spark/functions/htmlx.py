"""Engine-only HTML helpers (no reference analogue).

Link discovery feeds the frontier: the reference is a one-shot domain
scanner (no link following), but the north_rule's crawler enqueues
discovered URLs into the next wave.  Parsing is stdlib HTMLParser — bs4 is
unavailable here; semantics are engine-defined, not parity-bound.
"""

from __future__ import annotations

import urllib.parse
from html.parser import HTMLParser


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
