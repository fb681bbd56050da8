"""User-agent string parsing (E11 depth).

Reference: hypertrace-trace-enricher/.../util/UserAgentParser.java:25-56 wraps
a uadetector grammar parser behind a size+TTL LoadingCache and truncates
inputs to ``max.length``; UserAgentSpanEnricher.java:40-68 emits six enriched
fields (name, type, device category, OS name, OS version, browser version).

Columnar analog: ``parse_user_agents`` parses at UNIQUE level
(dictionary_encode → parse each distinct string once → take back out) with a
worker-lifetime memo dict on top — the cache hit rate of the reference's
caffeine cache, but batched: the per-string grammar walk runs once per NEW
distinct UA per worker, never per row.  Real-world UA strings are Zipf-heavy
(a handful of browser builds dominate), which is the same observation the
reference's cache exploits.

The grammar is a compact precedence ruleset over the public UA conventions
(product tokens, platform parentheticals) covering the browser / robot /
library / mobile families; unknown strings degrade to ("unknown", ...) rather
than erroring — parity with uadetector's UNKNOWN agent.
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np
import pyarrow as pa

# reference truncates incoming UA strings to config max.length
# (UserAgentParser.java:49-53); same guard here
UA_MAX_LENGTH = 256

UA_FIELDS = (
    "ua_name",
    "ua_type",
    "ua_device",
    "ua_os_name",
    "ua_os_version",
    "ua_version",
)

_UNKNOWN = ("unknown", "unknown", "unknown", "unknown", "", "")

# robots / libraries first: their tokens also contain browser-like "x/y"
# products, so they take precedence (uadetector classifies by agent type
# before family)
_BOT_RE = re.compile(r"(?i)(bot|spider|crawler|slurp|archiver)")
_LIB_RE = re.compile(
    r"(?i)^(curl|wget|python-requests|python-urllib|okhttp|libwww|go-http-client|java)[/ ]?([\w.]*)"
)

# browser families in precedence order: forks/shells carry the upstream
# tokens too (Edge and Opera UAs contain "Chrome/", Chrome UAs contain
# "Safari/"), so match most-specific first
_BROWSERS = (
    ("Edge", re.compile(r"Edge?[/ ]([\d.]+)")),
    ("Opera", re.compile(r"(?:OPR|Opera)[/ ]([\d.]+)")),
    ("Chrome", re.compile(r"(?:Chrome|CriOS)[/ ]([\d.]+)")),
    ("Firefox", re.compile(r"(?:Firefox|FxiOS)[/ ]([\d.]+)")),
    ("Safari", re.compile(r"Version[/ ]([\d.]+).*Safari[/ ]")),
    ("Internet Explorer", re.compile(r"MSIE ([\d.]+)|Trident/.*rv:([\d.]+)")),
)

# platform parentheticals → (os_name, device_category); version regex per OS
_OS_RULES = (
    ("Windows", re.compile(r"Windows NT ([\d.]+)"), "personal_computer"),
    ("iOS", re.compile(r"iPhone OS ([\d_]+)"), "smartphone"),
    ("iOS", re.compile(r"iPad.*?OS ([\d_]+)"), "tablet"),
    ("Android", re.compile(r"Android ([\d.]+)"), "smartphone"),
    ("Mac OS X", re.compile(r"Mac OS X ([\d_.]+)"), "personal_computer"),
    ("Linux", re.compile(r"Linux|X11"), "personal_computer"),
)


def parse_ua(ua: str) -> Tuple[str, str, str, str, str, str]:
    """Parse ONE user-agent string → (name, type, device, os_name,
    os_version, version).  Pure function; callers memoize."""
    if not ua:
        return _UNKNOWN
    ua = ua[:UA_MAX_LENGTH]

    lib = _LIB_RE.match(ua)
    if lib:
        return (lib.group(1).lower(), "library", "other", "unknown", "", lib.group(2) or "")
    if _BOT_RE.search(ua):
        name = ua.split("/", 1)[0].split(" ", 1)[0] or "robot"
        ver = re.search(r"/([\d.]+)", ua)
        return (name, "robot", "robot", "unknown", "", ver.group(1) if ver else "")

    os_name, os_version, device = "unknown", "", "unknown"
    for name, rx, dev in _OS_RULES:
        m = rx.search(ua)
        if m:
            os_name, device = name, dev
            os_version = (m.group(1).replace("_", ".") if m.groups() and m.group(1) else "")
            break
    # Android tablets: no "Mobile" token in the browser product section
    if os_name == "Android" and "Mobile" not in ua:
        device = "tablet"

    for fam, rx in _BROWSERS:
        m = rx.search(ua)
        if m:
            ver = next((g for g in m.groups() if g), "")
            return (fam, "browser", device, os_name, os_version, ver)
    if os_name != "unknown":
        return ("unknown", "browser", device, os_name, os_version, "")
    return _UNKNOWN


class UserAgentParser:
    """Worker-lifetime memoizing parser (LoadingCache analog with a bounded
    size: at ``max_size`` the memo resets — the columnar equivalent of cache
    eviction, trading re-parse for bounded memory)."""

    def __init__(self, max_size: int = 65_536):
        self._memo: Dict[str, Tuple[str, ...]] = {}
        self._max_size = max_size

    def parse_column(self, col) -> pa.Table:
        """Parse a string column → 6-column table (UA_FIELDS), row-aligned."""
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        enc = arr.dictionary_encode()
        uniq = enc.dictionary.to_pylist()
        if len(self._memo) + len(uniq) > self._max_size:
            self._memo.clear()
        cols: list = [np.empty(len(uniq), dtype=object) for _ in UA_FIELDS]
        for i, ua in enumerate(uniq):
            hit = self._memo.get(ua)
            if hit is None:
                hit = parse_ua(ua or "")
                self._memo[ua] = hit
            for c, v in zip(cols, hit):
                c[i] = v
        idx = enc.indices
        return pa.table(
            {
                f: pa.array(c, pa.string()).take(idx)
                for f, c in zip(UA_FIELDS, cols)
            }
        )
