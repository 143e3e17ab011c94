"""URL canonicalization + SURT keys for web-corpus curation.

The flagship pipeline keys windows by (lang, url-host) (BASELINE.json
north_star; ``fingerprint.host_of``).  Real crawl URLs arrive messy —
mixed-case schemes/hosts, default ports, fragments, tracking params,
unordered query strings — so a dedup/join key needs RFC 3986 syntax-based
normalization (RFC 3986 §6.2.2) plus the crawl-archive conventions:

- scheme + host lowercased, default ports (http:80 / https:443) removed
- fragment removed
- tracking params (utm_*, fbclid, gclid, ref) dropped; remaining query
  params sorted bytewise; an emptied query drops its '?'
- path '.'/'..' dot-segments resolved (RFC 3986 §5.2.4); empty path -> '/'
- SURT key (Sort-friendly URI Reordering Transform, the Internet
  Archive / Common Crawl CDX convention): leading 'www.' stripped, host
  reversed on dots with commas, then ')' + path?query — so one host's
  captures sort contiguously.

Everything is vectorized: polars string/list expressions over the whole
Arrow column, zero Python-per-row.  ``canonicalize_batch`` is the
map_batches kernel; the matching DuckDB oracle in pipelines/queries.py is
an INDEPENDENT SQL implementation of the same rules.
"""

from __future__ import annotations

import pyarrow as pa

from .fingerprint import _polars

_TRACKING_PREFIXES = ("utm_",)
_TRACKING_EXACT = ("fbclid", "gclid", "ref")

# One regex splits the URL into its RFC 3986 components (appendix B shape,
# specialised to hierarchical http(s) URLs).
_URL_RE = (
    r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.-]*)://"
    r"(?P<host>[^/:?#]*)(?::(?P<port>[0-9]*))?"
    r"(?P<path>[^?#]*)(?:\?(?P<query>[^#]*))?(?:#(?P<frag>.*))?$"
)


def _canon_exprs(pl, url_col: str):
    """polars expressions (scheme, host, port, path, query) -> canon parts."""
    scheme = pl.col(url_col).str.extract(_URL_RE, 1).str.to_lowercase()
    host = pl.col(url_col).str.extract(_URL_RE, 2).str.to_lowercase()
    port = pl.col(url_col).str.extract(_URL_RE, 3)
    path = pl.col(url_col).str.extract(_URL_RE, 4)
    query = pl.col(url_col).str.extract(_URL_RE, 5)

    default_port = (
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
        | port.is_null() | (port == "")
    )
    port_part = pl.when(default_port).then(pl.lit("")).otherwise(":" + port)

    # RFC 3986 §5.2.4 remove_dot_segments for the common crawl shapes:
    # collapse '/./' and resolve '/seg/../'.  Iterating a fixed number of
    # times handles nesting up to that depth (crawl paths are shallow);
    # each pass is a whole-column vectorized replace (polars' regex crate
    # has no lookaround, so trailing '/.'/'/seg/..' get their own rules).
    norm_path = pl.when(path == "").then(pl.lit("/")).otherwise(path)
    for _ in range(4):
        norm_path = norm_path.str.replace_all("/./", "/", literal=True)
        norm_path = norm_path.str.replace_all(r"/\.$", "/")
        norm_path = norm_path.str.replace_all(r"/[^/]+/\.\./", "/")
        norm_path = norm_path.str.replace_all(r"/[^/]+/\.\.$", "/")
        # excess leading '..' with nothing left to remove (RFC 3986
        # §5.2.4 step 2C when the output stack is empty)
        norm_path = norm_path.str.replace_all(r"^/\.\./", "/")
        norm_path = norm_path.str.replace_all(r"^/\.\.$", "/")
    norm_path = pl.when(norm_path == "").then(pl.lit("/")).otherwise(norm_path)

    is_tracking = None
    el = pl.element()
    for p in _TRACKING_PREFIXES:
        cond = el.str.starts_with(p)
        is_tracking = cond if is_tracking is None else (is_tracking | cond)
    for name in _TRACKING_EXACT:
        cond = el.str.split("=").list.first() == name
        is_tracking = is_tracking | cond
    canon_q = (
        query.fill_null("").str.split("&")
        .list.eval(el.filter(~is_tracking & (el != "")))
        .list.sort().list.join("&")
    )
    q_part = pl.when(canon_q == "").then(pl.lit("")).otherwise("?" + canon_q)
    return scheme, host, port_part, norm_path, q_part


def canonicalize_batch(batch: pa.Table, url_col: str = "url") -> pa.Table:
    """map_batches kernel: adds ``canon_url`` and ``surt_key`` columns."""
    pl = _polars()
    df = pl.from_arrow(batch)
    scheme, host, port_part, path, q_part = _canon_exprs(pl, url_col)
    surt_host = (
        host.str.strip_prefix("www.").str.split(".").list.reverse().list.join(",")
    )
    out = df.with_columns(
        (scheme + "://" + host + port_part + path + q_part).alias("canon_url"),
        (surt_host + ")" + path + q_part).alias("surt_key"),
    )
    return out.to_arrow()


# ---------------------------------------------------------------------------
# Blocklist matchers: sorted-array searchsorted probes (O(rows log rules)
# per batch), replacing per-rule vectorized column scans (O(rules) scans
# per batch — a scale-killer at real 100k+ entry blocklists).
# Reference analog: broadcast lookup J2 (src/data_input/process_odr.py:699).
# ---------------------------------------------------------------------------


def _minimize_sorted_prefix_keys(keys):
    """Drop keys that EXTEND a shorter kept key (the shorter prefix already
    matches everything the longer one would).  After this, no key is a
    prefix of another — so for any probe string, the searchsorted
    predecessor is the ONLY candidate prefix match (proof: if key r is a
    prefix of probe h and r < r' <= h lexicographically, then r' must
    start with r, which minimization forbids)."""
    kept: list[str] = []
    for k in keys:
        if not kept or not k.startswith(kept[-1]):
            kept.append(k)
    return kept


class HostSuffixMatcher:
    """Domain-suffix blocklist: an entry blocks itself and every subdomain.

    ``host matches rule`` iff ``('.'+host).endswith('.'+rule)`` iff
    ``reversed(host)+'.'`` starts with ``reversed(rule)+'.'``.  Build once
    (reverse + sort + minimize, in ``__init__`` of the actor holding it);
    answer each batch with ONE ``np.searchsorted`` probe per row plus one
    elementwise prefix check against the predecessor key.
    """

    def __init__(self, hosts) -> None:
        import numpy as np

        keys = sorted({str(h).lower()[::-1] + "." for h in hosts if h})
        self.keys = np.asarray(_minimize_sorted_prefix_keys(keys), dtype="U")

    def matches(self, hosts) -> "np.ndarray":
        """hosts: pa.Array / pd.Series / ndarray of str -> bool ndarray."""
        import numpy as np
        import pandas as pd

        s = pd.Series(
            hosts.to_pandas() if isinstance(hosts, (pa.Array, pa.ChunkedArray))
            else hosts)
        if not len(self.keys) or not len(s):
            return np.zeros(len(s), dtype=bool)
        rh = (s.fillna("").astype(str).str[::-1] + ".").to_numpy().astype("U")
        idx = np.searchsorted(self.keys, rh, side="right")
        cand = self.keys[np.maximum(idx - 1, 0)]
        return (idx > 0) & np.char.startswith(rh, cand)


class PathPrefixMatcher:
    """Path-prefix blocklist via the same sorted-array searchsorted idiom
    (no reversal: prefix semantics are already left-anchored)."""

    def __init__(self, prefixes) -> None:
        import numpy as np

        keys = sorted({str(p) for p in prefixes if p})
        self.keys = np.asarray(_minimize_sorted_prefix_keys(keys), dtype="U")

    def matches(self, paths) -> "np.ndarray":
        import numpy as np
        import pandas as pd

        s = pd.Series(
            paths.to_pandas() if isinstance(paths, (pa.Array, pa.ChunkedArray))
            else paths)
        if not len(self.keys) or not len(s):
            return np.zeros(len(s), dtype=bool)
        p = s.fillna("").astype(str).to_numpy().astype("U")
        idx = np.searchsorted(self.keys, p, side="right")
        cand = self.keys[np.maximum(idx - 1, 0)]
        return (idx > 0) & np.char.startswith(p, cand)
