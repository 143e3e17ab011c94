"""Sitemap (sitemaps.org XML protocol) parsing for crawl-frontier
seeding.

Real crawlers seed and refresh their frontiers from per-host sitemaps:
a ``<sitemapindex>`` names child sitemap files, each ``<urlset>`` lists
page URLs with optional ``lastmod`` / ``changefreq`` / ``priority``
hints the scheduler uses for recrawl ordering.  This module implements
the public protocol (https://www.sitemaps.org/protocol.html) with
stdlib-only parsing:

- gzip-compressed sitemap files (RFC 1952 sniff, the ``.xml.gz``
  convention) are decompressed transparently;
- XML namespaces (default or prefixed) are ignored by local-name
  matching, as the protocol requires readers to accept both;
- ``lastmod`` accepts the W3C Datetime profile used by the protocol:
  ``YYYY-MM-DD``, ``YYYY-MM-DDThh:mmTZD``, ``YYYY-MM-DDThh:mm:ss(.s)TZD``
  with ``Z`` or ``±hh:mm`` zone designators, normalized to epoch ms UTC;
- entity-escaped URLs (``&amp;`` etc.) come back decoded by the XML
  parser, per the protocol's escaping rules.

The per-file parse is proportional to the file's byte size — sitemap
files are bounded by the protocol at 50k URLs / 50 MB uncompressed — so
a ``map_batches`` stage over a Dataset of fetched sitemap payloads is
embarrassingly parallel: no state, no shuffle.  (Reference analog: the
crawl-side ingest chain around ``src/data_input/process_odr.py`` parses
per-source metadata documents row-wise the same way.)
"""
from __future__ import annotations

import re
import xml.etree.ElementTree as ET
import zlib

_GZIP_MAGIC = b"\x1f\x8b"

# W3C Datetime (the subset the sitemap protocol names).
_W3C_RE = re.compile(
    r"^(\d{4})-(\d{2})-(\d{2})"
    r"(?:[Tt](\d{2}):(\d{2})(?::(\d{2})(?:\.(\d+))?)?"
    r"(?:[Zz]|([+-])(\d{2}):(\d{2}))?)?$"
)

_DAYS_BEFORE_MONTH = (0, 0, 31, 59, 90, 120, 151, 181, 212, 243, 273, 304, 334)


def _days_from_civil(y: int, m: int, d: int) -> int:
    """Days since 1970-01-01 for a proleptic-Gregorian date (Howard
    Hinnant's public algorithm — no datetime objects in the hot loop)."""
    leap = (y % 4 == 0 and y % 100 != 0) or y % 400 == 0
    yday = _DAYS_BEFORE_MONTH[m] + d - 1 + (1 if leap and m > 2 else 0)
    y -= 1
    return y * 365 + y // 4 - y // 100 + y // 400 + yday - 719162


def parse_w3c_datetime_ms(s: str) -> int | None:
    """W3C Datetime → epoch milliseconds UTC, or None if unparseable."""
    m = _W3C_RE.match(s.strip())
    if not m:
        return None
    y, mo, d = int(m.group(1)), int(m.group(2)), int(m.group(3))
    if not (1 <= mo <= 12 and 1 <= d <= 31):
        return None
    ms = _days_from_civil(y, mo, d) * 86_400_000
    if m.group(4) is not None:
        ms += int(m.group(4)) * 3_600_000 + int(m.group(5)) * 60_000
        if m.group(6) is not None:
            ms += int(m.group(6)) * 1000
        if m.group(7):
            ms += int(round(float("0." + m.group(7)) * 1000))
        if m.group(8):  # ±hh:mm offset — convert local to UTC
            off = int(m.group(9)) * 3_600_000 + int(m.group(10)) * 60_000
            ms += -off if m.group(8) == "+" else off
    return ms


def _local(tag: str) -> str:
    """Element local name with any ``{namespace}`` prefix stripped."""
    return tag.rsplit("}", 1)[-1]


def maybe_gunzip(payload: bytes) -> bytes:
    """Transparent RFC 1952 member decompression (``sitemap.xml.gz``)."""
    if payload[:2] == _GZIP_MAGIC:
        return zlib.decompress(payload, 31)
    return payload


def parse_sitemap(payload: bytes) -> dict:
    """Parse one fetched sitemap file (plain or gzipped XML).

    Returns ``{"kind": "urlset" | "sitemapindex", "entries": [...]}``
    where each entry is ``{"loc": str, "lastmod_ms": int | None,
    "changefreq": str | None, "priority": float | None}`` (index
    entries carry only ``loc`` / ``lastmod_ms``).  Raises ``ValueError``
    on malformed XML or a non-sitemap root so callers can apply their
    corrupt-payload policy (flag/skip, like ``stages/media.py``).
    """
    text = maybe_gunzip(payload)
    try:
        root = ET.fromstring(text)
    except ET.ParseError as e:
        raise ValueError(f"malformed sitemap XML: {e}") from e
    kind = _local(root.tag)
    if kind not in ("urlset", "sitemapindex"):
        raise ValueError(f"not a sitemap root: {root.tag!r}")
    entries = []
    for child in root:
        if _local(child.tag) not in ("url", "sitemap"):
            continue
        loc = lastmod = changefreq = priority = None
        for f in child:
            name, val = _local(f.tag), (f.text or "").strip()
            if name == "loc":
                loc = val
            elif name == "lastmod":
                lastmod = parse_w3c_datetime_ms(val)
            elif name == "changefreq":
                changefreq = val.lower() or None
            elif name == "priority":
                try:
                    priority = min(max(float(val), 0.0), 1.0)
                except ValueError:
                    priority = None
        if loc:
            entries.append({"loc": loc, "lastmod_ms": lastmod,
                            "changefreq": changefreq, "priority": priority})
    return {"kind": kind, "entries": entries}


def build_urlset(urls: list[dict], *, gzip_out: bool = False,
                 ns_prefix: bool = False) -> bytes:
    """Serialize a ``<urlset>`` sitemap (fixture/writer side).

    Each dict may carry ``loc`` (required), ``lastmod`` (string, written
    verbatim), ``changefreq``, ``priority``.  ``ns_prefix=True`` writes
    an explicitly prefixed namespace (``<sm:urlset>``) — both forms are
    legal and readers must accept both."""
    p = "sm:" if ns_prefix else ""
    ns = (' xmlns:sm="http://www.sitemaps.org/schemas/sitemap/0.9"'
          if ns_prefix else
          ' xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"')
    out = ['<?xml version="1.0" encoding="UTF-8"?>', f"<{p}urlset{ns}>"]
    for u in urls:
        out.append(f"<{p}url>")
        loc = (u["loc"].replace("&", "&amp;").replace("<", "&lt;")
               .replace(">", "&gt;"))
        out.append(f"<{p}loc>{loc}</{p}loc>")
        if u.get("lastmod") is not None:
            out.append(f"<{p}lastmod>{u['lastmod']}</{p}lastmod>")
        if u.get("changefreq") is not None:
            out.append(f"<{p}changefreq>{u['changefreq']}</{p}changefreq>")
        if u.get("priority") is not None:
            out.append(f"<{p}priority>{u['priority']:.1f}</{p}priority>")
        out.append(f"</{p}url>")
    out.append(f"</{p}urlset>")
    xml = "\n".join(out).encode()
    if gzip_out:
        co = zlib.compressobj(6, zlib.DEFLATED, 31)
        return co.compress(xml) + co.flush()
    return xml


def build_sitemapindex(locs: list[str], lastmods: list[str | None]) -> bytes:
    """Serialize a ``<sitemapindex>`` naming child sitemap files."""
    out = ['<?xml version="1.0" encoding="UTF-8"?>',
           '<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">']
    for loc, lm in zip(locs, lastmods):
        out.append("<sitemap>")
        out.append(f"<loc>{loc}</loc>")
        if lm is not None:
            out.append(f"<lastmod>{lm}</lastmod>")
        out.append("</sitemap>")
    out.append("</sitemapindex>")
    return "\n".join(out).encode()
