"""Seeded User-Agent rotation.

The reference picks ``random.choice(USER_AGENTS)`` per request from a
44-entry pool (``/root/reference/httpz_scanner/utils.py:24-67``,
``scanner.py:209``) — non-reproducible by construction.  The engine keeps
the pool-of-44 shape but replaces ``random`` with a **seeded murmur pick**
(SURVEY §2 A24): ``pool[murmur3(url, attempt, seed) % 44]``, so runs are
bit-reproducible and the parity harness can pin both sides to the same
choice.  The pool itself is synthesized (browser/version grid), not copied.
"""

from __future__ import annotations

from httpz_spark.functions.hashing import murmur3_x64_128

_BROWSERS = [
    ("Chrome", "Windows NT 10.0; Win64; x64", [122, 125, 126, 128, 129, 130, 131, 132, 133]),
    ("Chrome", "Macintosh; Intel Mac OS X 10_15_7", [125, 126, 128, 129, 130, 131, 132, 133]),
    ("Chrome", "X11; Linux x86_64", [126, 129, 130, 131, 132, 133]),
    ("Chrome", "X11; CrOS x86_64 14541.0.0", [131, 132]),
    ("Edge", "Windows NT 10.0; Win64; x64", [129, 131, 132]),
    ("Opera", "Windows NT 10.0; Win64; x64", [114, 116]),
    ("Firefox", "Windows NT 10.0; Win64; x64", [134, 135]),
    ("Firefox", "X11; Linux x86_64", [134, 135]),
    ("Firefox", "X11; Ubuntu; Linux x86_64", [134]),
    ("Firefox", "Macintosh; Intel Mac OS X 10.15", [134, 135]),
    ("Safari", "Macintosh; Intel Mac OS X 10_15_7", [16, 17, 18]),
    ("Chrome", "Windows NT 11.0; Win64; x64", [130, 131]),
    ("Edge", "Macintosh; Intel Mac OS X 10_15_7", [132]),
    ("Firefox", "Windows NT 10.0; Win64; x64; rv:136.0-pre", [136]),
]


def _build_pool() -> tuple:
    pool = []
    for browser, platform, versions in _BROWSERS:
        for v in versions:
            if browser == "Chrome":
                pool.append(
                    f"Mozilla/5.0 ({platform}) AppleWebKit/537.36 (KHTML, like Gecko) "
                    f"Chrome/{v}.0.0.0 Safari/537.36"
                )
            elif browser == "Edge":
                pool.append(
                    f"Mozilla/5.0 ({platform}) AppleWebKit/537.36 (KHTML, like Gecko) "
                    f"Chrome/{v}.0.0.0 Safari/537.36 Edg/{v}.0.0.0"
                )
            elif browser == "Opera":
                pool.append(
                    f"Mozilla/5.0 ({platform}) AppleWebKit/537.36 (KHTML, like Gecko) "
                    f"Chrome/{v + 15}.0.0.0 Safari/537.36 OPR/{v}.0.0.0"
                )
            elif browser == "Firefox":
                pool.append(f"Mozilla/5.0 ({platform}; rv:{v}.0) Gecko/20100101 Firefox/{v}.0")
            else:
                pool.append(
                    f"Mozilla/5.0 ({platform}) AppleWebKit/605.1.15 (KHTML, like Gecko) "
                    f"Version/{v}.2 Safari/605.1.15"
                )
    assert len(pool) >= 44, len(pool)
    return tuple(pool[:44])


USER_AGENTS = _build_pool()


def ua_for(url: str, attempt: int, seed: int = 42) -> str:
    """Deterministic per-(url, attempt) pick — replaces random.choice."""
    h = murmur3_x64_128(f"{seed}:ua:{url}:{attempt}".encode())[0]
    return USER_AGENTS[h % len(USER_AGENTS)]
