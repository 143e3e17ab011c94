"""General HTML → text extraction for web corpora.

``fingerprint.extract_text`` is the flagship's strict single-``<p>``
extractor (invertible against the fixture writer, per the BASELINE.json
byte-identical invariant).  Real crawl HTML is messier; this module is the
general-purpose extractor a Common-Crawl-style corpus needs:

- ``<!-- -->`` comments and ``<script>/<style>/<noscript>/<template>``
  elements removed WITH their content (script bodies may contain ``<``,
  ``>``, ``&&`` and fake tags — handled by quote-aware tag grammar)
- block-level tags become newlines, inline tags disappear; attribute
  values may contain quoted ``>`` (``data-x="a>b"``) — the tag pattern
  ``<(?:[^>"']|"[^"]*"|'[^']*')*>`` consumes them correctly
- character references decoded: the common named set via ordered literal
  replaces (``&amp;`` last, so ``&amp;copy;`` stays literal ``&copy;``),
  ALL decimal/hex numeric references exactly (distinct refs of the batch
  are enumerated, then each is one vectorized literal replace);
  ``&nbsp;`` maps to a plain space as a normalization choice
- whitespace normalized: runs of spaces collapse, newlines trim their
  margins, blank lines collapse, output is stripped

Everything is whole-column polars/rust-regex (no lookaround, no
backreferences needed); the only Python loop is over the batch's DISTINCT
numeric character references (bounded, typically ~0-5).
"""

from __future__ import annotations

import pyarrow as pa

from .fingerprint import _polars

# quote-aware tag body: attribute values may contain '>' inside quotes
_TAG_BODY = r"(?:[^>\"']|\"[^\"]*\"|'[^']*')*"

_BLOCK_TAGS = ("p|div|br|li|ul|ol|tr|td|th|table|h[1-6]|blockquote|section"
               "|article|header|footer|nav|form|hr|pre|dl|dt|dd|main|aside"
               "|figure|figcaption|address|fieldset|legend|details|summary")

# ordered: longest-first where prefixes overlap; &amp; strictly last
_NAMED_ENTITIES = [
    ("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
    ("&apos;", "'"), ("&#39;", "'"), ("&mdash;", "—"),
    ("&ndash;", "–"), ("&hellip;", "…"), ("&rsquo;", "’"),
    ("&lsquo;", "‘"), ("&ldquo;", "“"), ("&rdquo;", "”"),
    ("&copy;", "©"), ("&reg;", "®"), ("&trade;", "™"),
    ("&middot;", "·"), ("&bull;", "•"), ("&laquo;", "«"),
    ("&raquo;", "»"), ("&deg;", "°"), ("&times;", "×"),
    ("&amp;", "&"),
]

_NUMREF_RE = r"&#[0-9]+;|&#[xX][0-9a-fA-F]+;"

# Four messy-page templates (prefix, suffix) shared by the fixture writer
# and the oracle-backed queries: hostile script bodies, comments hiding
# tags, quoted '>' attributes, named + numeric character references.
MESSY_HEAD = ('<!DOCTYPE html><html><head><title>T</title>'
              '<style>body { color: #fff; }</style>'
              '<script type="text/javascript">'
              'if (x<y && y>z) { alert("</div>"); }</script></head><body>')
MESSY_TEMPLATES = [
    (MESSY_HEAD + '<nav><a href="/">Home</a> <a href="/about">About</a>'
     '</nav><!-- hidden <p>not text</p> --><p>',
     '</p><footer>Copyright &copy; 2024 &#8212; Example Corp</footer>'
     '</body></html>'),
    ('<div id="menu" data-x="a>b"><span>Menu&nbsp;One</span> '
     '<span>Menu&#32;Two</span></div><div class="content">',
     '</div><div>Contact: info&#64;example.com</div>'),
    ('<ul><li>alpha</li><li>beta &amp; gamma</li></ul><p>',
     '</p><table><tr><td>cell1</td><td>2 &lt; 3</td></tr></table>'),
    ('<h1>Header &quot;Quoted&quot;</h1><noscript><p>enable js</p>'
     '</noscript><article>',
     '</article><template><div>never shown</div></template>'
     '<p>fin&hellip;</p>'),
]


def wrap_html_messy(text: str, variant: int) -> bytes:
    """One messy page (template ``variant % 4``) around escaped text —
    the fixture-side counterpart of ``extract_text_general``."""
    import html as _htmlmod

    pre, suf = MESSY_TEMPLATES[variant % 4]
    return (pre + _htmlmod.escape(text, quote=False) + suf).encode("utf-8")


def _decode_numeric_refs(pl, expr, frame):
    """Replace every distinct numeric character reference present in the
    frame's ``t`` column — each distinct ref is ONE vectorized literal
    replace over the whole column."""
    refs = (
        frame.select(pl.col("t").str.extract_all(_NUMREF_RE).alias("r"))
        .explode("r").drop_nulls("r").unique()["r"].to_list()
    )
    for ref in refs:
        body = ref[2:-1]
        cp = int(body[1:], 16) if body[:1] in ("x", "X") else int(body)
        if 0 < cp <= 0x10FFFF and not (0xD800 <= cp <= 0xDFFF):
            expr = expr.str.replace_all(ref, chr(cp), literal=True)
    return expr


# elements whose CONTENT is not page text (head covers title/meta; title
# listed separately for fragments without a head)
_CONTENT_REMOVED = ("head", "script", "style", "noscript", "template", "title")


def _strip_nontext(t):
    """comments + non-content elements go first (their bodies may hold
    fake tags/entities that must never reach later stages)."""
    t = t.str.replace_all(r"(?s)<!--.*?-->", "")
    for el in _CONTENT_REMOVED:
        t = t.str.replace_all(
            rf"(?si)<{el}\b{_TAG_BODY}>.*?</{el}\s*>", "")
    return t


def _extract_exprs(pl, col: str):
    t = _strip_nontext(pl.col(col))
    # block boundaries -> newline, every remaining tag -> nothing
    t = t.str.replace_all(rf"(?i)</?(?:{_BLOCK_TAGS})\b{_TAG_BODY}>", "\n")
    t = t.str.replace_all(rf"<{_TAG_BODY}>", "")
    return t


def _normalize_ws(t):
    t = t.str.replace_all(r"[\t\r\f\v]", " ")
    t = t.str.replace_all(r" {2,}", " ")
    t = t.str.replace_all(r" ?\n ?", "\n")
    t = t.str.replace_all(r"\n+", "\n")
    return t.str.strip_chars(" \n")


def extract_text_general(html_col: pa.Array | pa.ChunkedArray,
                         decode_entities: bool = True) -> pa.Array:
    """binary/string html column → extracted plain text (one line per
    block element, entities decoded, whitespace normalized).  Binary
    input goes through the crawl charset-fallback rule first (UTF-8
    where valid, Latin-1 otherwise — functions/charset.py), so legacy-
    encoded pages extract instead of failing the Arrow UTF-8 cast."""
    pl = _polars()
    if isinstance(html_col, pa.ChunkedArray):
        html_col = html_col.combine_chunks()
    if pa.types.is_binary(html_col.type) or pa.types.is_large_binary(html_col.type):
        from .charset import decode_with_fallback

        _, html_col = decode_with_fallback(html_col)
    s = html_col.cast(pa.large_string())
    frame = pl.DataFrame({"t": pl.from_arrow(s)})
    t = _extract_exprs(pl, "t")
    if decode_entities:
        stripped = frame.with_columns(t.alias("t"))
        t = pl.col("t")
        t = _decode_numeric_refs(pl, t, stripped)
        for lit, rep in _NAMED_ENTITIES:
            t = t.str.replace_all(lit, rep, literal=True)
        frame = stripped
    out = frame.select(_normalize_ws(t).alias("t"))["t"]
    return out.to_arrow().cast(pa.string())


def link_density(html_col: pa.Array | pa.ChunkedArray) -> pa.Array:
    """chars of ``<a>``-anchored text / chars of total extracted text —
    the classic boilerplate signal (navigation-heavy blocks score high).
    Returns float64 in [0, 1] (0 where the page has no text)."""
    import numpy as np
    import pyarrow.compute as pc

    pl = _polars()
    if isinstance(html_col, pa.ChunkedArray):
        html_col = html_col.combine_chunks()
    if pa.types.is_binary(html_col.type) or pa.types.is_large_binary(html_col.type):
        from .charset import decode_with_fallback

        _, html_col = decode_with_fallback(html_col)
    s = html_col.cast(pa.large_string())
    frame = pl.DataFrame({"t": pl.from_arrow(s)})
    # anchor inner text, entity-decoded like the extraction output so the
    # two char counts measure the same thing (hidden anchors don't count)
    anchors_txt = (
        _strip_nontext(pl.col("t"))
        .str.extract_all(rf"(?si)<a\b{_TAG_BODY}>.*?</a\s*>")
        .list.join("").str.replace_all(rf"<{_TAG_BODY}>", "")
    )
    aframe = frame.select(anchors_txt.alias("t"))
    a = _decode_numeric_refs(pl, pl.col("t"), aframe)
    for lit, rep in _NAMED_ENTITIES:
        a = a.str.replace_all(lit, rep, literal=True)
    n_anchor = (
        aframe.select(a.str.len_chars().fill_null(0).alias("n"))["n"]
        .to_numpy().astype(np.float64)
    )
    n_total = pc.utf8_length(extract_text_general(html_col)) \
        .to_numpy(zero_copy_only=False).astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        dens = np.where(n_total > 0, n_anchor / n_total, 0.0)
    return pa.array(dens, pa.float64())
