"""Content-fingerprint kernels: HTML text extraction, token hashing,
SimHash, MinHash — all deterministic and vectorized (numpy / pyarrow.compute),
designed to run inside ``Dataset.map_batches(batch_format="pyarrow")``.

Reference analog: the per-record parse/flatten path of the Flink job
(``src/flink_job/serialization.py:14-20``, ``src/flink_job/job.py:63-75``)
re-targeted at web pages per BASELINE.json's input hint.  The per-row
invariant "byte-identical extracted text per url" is guaranteed because
extraction is pure bytes/Arrow code with no environment dependence.

Determinism notes
-----------------
* Token hashing uses ``pandas.util.hash_array`` with a fixed ``hash_key``
  (SipHash-based, C-vectorized, stable across processes — unlike builtin
  ``hash`` under PYTHONHASHSEED).
* MinHash permutations and SimHash bit votes use seeded multiply-add
  universal hashing over uint64 with wraparound; parameters derive from a
  fixed seed so every worker computes identical fingerprints.
"""

from __future__ import annotations

import html as _htmlmod

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

TOKEN_HASH_KEY = "ffr-token-hash-0".ljust(16)[:16]  # 16-byte key for SipHash
MINHASH_K = 64  # number of minhash permutations (list<uint32>[64] per doc)
SHINGLE_W = 3   # tokens per shingle
_SEED = 0x5EED_F1A6

# -- deterministic odd multipliers / offsets for k universal hash funcs -----
_rng = np.random.RandomState(_SEED & 0x7FFFFFFF)
_MH_A = (_rng.randint(0, 2**63, size=MINHASH_K, dtype=np.uint64) * 2 + 1).astype(np.uint64)
_MH_B = _rng.randint(0, 2**63, size=MINHASH_K, dtype=np.uint64).astype(np.uint64)
# shingle combiners (odd constants; sized for the largest window any
# caller uses — rolling_fingerprint uses w=4, n-gram ops up to 8)
_MAX_SHINGLE_W = 8
_SH_C = (_rng.randint(0, 2**63, size=_MAX_SHINGLE_W, dtype=np.uint64) * 2 + 1).astype(np.uint64)

_EMPTY_MINHASH = np.full(MINHASH_K, np.iinfo(np.uint32).max, dtype=np.uint32)

_PL = None  # cached healthy polars module, probed once per process


def _polars():
    """Import polars with a self-heal for the stale-partial-import trap.

    ``polars._utils.wrap`` binds ``polars._reexport`` at module import.  If
    a worker's FIRST ``import polars`` dies midway (transient resource blip
    during the 32-worker import storm of a fresh session), Python removes
    ``polars`` / ``polars._reexport`` from ``sys.modules`` but leaves the
    already-complete submodules (including ``_utils.wrap``) cached.  The
    retrying import then rebuilds ``_reexport`` fresh, while the cached
    ``wrap`` still points at the DEAD first-attempt module — and every
    ``wrap_s`` call raises ``AttributeError: polars._reexport has no
    attribute 'Series'`` forever in that process (observed aborting whole
    bench runs).  The heal: dereference the exact attribute ``wrap_s``
    uses (a pure attribute probe — running a real polars op here instead
    measurably slowed whole-pipeline runs); on failure purge every
    ``polars*`` entry from ``sys.modules`` so the next import rebinds the
    whole circular chain.
    """
    global _PL
    if _PL is not None:
        return _PL
    import os as _os
    import sys as _sys
    import time as _time

    # pin BEFORE first import: polars' default pool is os.cpu_count()
    # threads PER WORKER; 32 workers x 32 threads thrashed large epochs
    _os.environ.setdefault("POLARS_MAX_THREADS", "1")
    last: Exception | None = None
    for attempt in range(4):
        try:
            import polars as pl
            from polars._utils import wrap as _w

            _w.pl.Series  # noqa: B018 — the attribute wrap_s dereferences
            _PL = pl
            return pl
        except (AttributeError, ImportError) as exc:
            last = exc
            for k in [m for m in list(_sys.modules)
                      if m == "polars" or m.startswith("polars.")]:
                _sys.modules.pop(k, None)
            _time.sleep(0.05 * (attempt + 1))
    raise last  # type: ignore[misc]


def hash_fingerprint() -> str:
    """Hex digest of the seeded token-hash over a fixed sentinel token set.

    polars does not guarantee ``Series.hash`` stable across versions, and
    minhash/simhash/band keys derived from it persist in window-state
    checkpoints.  The checkpoint manifest records this fingerprint and
    REFUSES resume on mismatch — a polars upgrade must not silently mix
    incompatible hashes into dup-cluster state.
    """
    import hashlib

    sentinel = pa.array(
        ["the", "quick", "brown", "fox", "0", "ß", "日本語", "a" * 64],
        pa.large_string(),
    )
    pl = _polars()

    h = pl.from_arrow(sentinel).hash(seed=_SEED).to_numpy().astype(np.uint64)
    return hashlib.sha1(h.tobytes()).hexdigest()


# ---------------------------------------------------------------------------
# HTML wrap / extract (invertible; fixture writes, engine extracts)
# ---------------------------------------------------------------------------

_HTML_PREFIX = "<html><head><title>page</title></head><body><nav>boilerplate nav</nav><p>"
_HTML_SUFFIX = "</p><footer>boilerplate footer</footer></body></html>"


def wrap_html(text: str) -> bytes:
    """Deterministic HTML template wrapping `text` (fixture side).

    Escapes the text so extraction (regex + unescape) is exactly invertible
    → byte-identical extracted text per url (BASELINE.json input_hint).
    """
    return (_HTML_PREFIX + _htmlmod.escape(text, quote=False) + _HTML_SUFFIX).encode("utf-8")


def extract_text(html_col: pa.Array | pa.ChunkedArray) -> pa.Array:
    """binary html → extracted text, pure Arrow kernels (zero Python rows).

    Target analog of ``parse_sensor_event`` (src/flink_job/serialization.py:14-20):
    the first per-record map of the pipeline.  RE2 non-greedy capture of the
    <p> body, then entity unescape (&lt; &gt; &amp;, amp last).
    """
    if isinstance(html_col, pa.ChunkedArray):
        html_col = html_col.combine_chunks()
    s = html_col.cast(pa.large_string())
    st = pc.extract_regex(s, r"(?s)<p>(?P<t>.*?)</p>")
    t = pc.struct_field(st, "t")
    # rows with no match (malformed html) -> empty string, like the reference
    # drops "null" payloads (src/flink_job/job.py:68)
    t = pc.coalesce(t, pa.scalar("", type=pa.large_string()))
    t = pc.replace_substring(t, "&lt;", "<")
    t = pc.replace_substring(t, "&gt;", ">")
    t = pc.replace_substring(t, "&amp;", "&")
    return t


def host_of(url_col: pa.Array | pa.ChunkedArray) -> pa.Array:
    """url → host, vectorized: strip scheme, take up to first '/'."""
    if isinstance(url_col, pa.ChunkedArray):
        url_col = url_col.combine_chunks()
    u = url_col.cast(pa.large_string())
    st = pc.extract_regex(u, r"^(?:[a-z+]+://)?(?P<h>[^/]+)")
    h = pc.struct_field(st, "h")
    return pc.coalesce(h, pa.scalar("", type=pa.large_string()))


# ---------------------------------------------------------------------------
# Tokenization + hashing
# ---------------------------------------------------------------------------

def _tokenize(texts: pa.Array | pa.ChunkedArray) -> tuple[np.ndarray, np.ndarray]:
    """Lowercase + whitespace-split all texts at once.

    Returns (flat_token_hashes: uint64[n_tokens], doc_token_counts: int64[n_docs]).
    """
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    toks = pc.split_pattern_regex(
        pc.utf8_lower(texts.cast(pa.large_string())), r"\s+"
    )
    # drop empty tokens produced by leading/trailing whitespace
    flat = toks.flatten()
    n_per_doc = pc.list_value_length(toks).fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64)
    nonempty = pc.not_equal(flat, "")
    # adjust per-doc counts for removed empty tokens via segmented sum
    keep = nonempty.to_numpy(zero_copy_only=False)
    if not keep.all():
        doc_ids = np.repeat(np.arange(len(n_per_doc)), n_per_doc)
        n_per_doc = np.bincount(doc_ids[keep], minlength=len(n_per_doc)).astype(np.int64)
        flat = flat.filter(nonempty)
    if len(flat):
        # polars' seeded hash runs directly over the Arrow string buffer —
        # no per-token Python objects (pandas hash_array needs an object
        # array: ~25M PyStr allocations per epoch at real doc sizes) and
        # deterministic across processes for a fixed seed.
        pl = _polars()

        h = pl.from_arrow(flat).hash(seed=_SEED).to_numpy().astype(np.uint64)
    else:
        h = np.empty(0, dtype=np.uint64)
    return h, n_per_doc


def _shingle_hashes(tok_h: np.ndarray, n_per_doc: np.ndarray, w: int = SHINGLE_W):
    """w-token shingle hashes per doc, fully vectorized.

    Returns (shingles: uint64[n_shingles], counts: int64[n_docs]) where
    counts[d] = max(0, n_per_doc[d] - w + 1).
    """
    n_docs = len(n_per_doc)
    counts = np.maximum(n_per_doc - (w - 1), 0)
    if tok_h.size == 0 or counts.sum() == 0:
        return np.empty(0, dtype=np.uint64), counts
    with np.errstate(over="ignore"):
        acc = np.zeros(len(tok_h) - (w - 1), dtype=np.uint64)
        for j in range(w):
            acc += tok_h[j: len(tok_h) - (w - 1) + j] * _SH_C[j]
    # positions where the shingle would span a doc boundary are invalid
    doc_start = np.concatenate(([0], np.cumsum(n_per_doc)))[:-1]
    valid = np.ones(len(acc), dtype=bool)
    # a shingle starting at flat index i is valid iff i+w-1 is in the same doc;
    # mark the (w-1) trailing positions of every doc invalid
    ends = doc_start + n_per_doc  # one past last token of each doc
    for j in range(1, w):
        bad = ends - j
        bad = bad[(bad >= 0) & (bad < len(acc))]
        valid[bad] = False
    shingles = acc[valid]
    return shingles, counts


def _segment_starts(counts: np.ndarray) -> np.ndarray:
    return np.concatenate(([0], np.cumsum(counts)))[:-1].astype(np.int64)


def _minhash_from_shingles(sh: np.ndarray, counts: np.ndarray, k: int) -> np.ndarray:
    n_docs = len(counts)
    out = np.tile(_EMPTY_MINHASH[:k], (n_docs, 1))
    if sh.size == 0:
        return out
    starts = _segment_starts(counts)
    nz = counts > 0
    with np.errstate(over="ignore"):
        for i in range(k):
            hv = (sh * _MH_A[i] + _MH_B[i]) >> np.uint64(32)
            mins = np.minimum.reduceat(hv, starts[nz])
            out[nz, i] = mins.astype(np.uint32)
    return out


def minhash(texts: pa.Array | pa.ChunkedArray, k: int = MINHASH_K) -> np.ndarray:
    """(n_docs, k) uint32 MinHash signatures over w-token shingles.

    Docs with < SHINGLE_W tokens get the sentinel signature (all 0xFFFFFFFF).
    This is the sketch layer the reference lacks (SURVEY.md §2.7): k
    wrapping multiply-add permutations, per-doc segmented min.
    """
    tok_h, n_per_doc = _tokenize(texts)
    sh, counts = _shingle_hashes(tok_h, n_per_doc)
    return _minhash_from_shingles(sh, counts, k)


def simhash_and_minhash(texts: pa.Array | pa.ChunkedArray, k: int = MINHASH_K) -> tuple[np.ndarray, np.ndarray]:
    """Both fingerprints from ONE tokenize+shingle pass (the hot-path
    combination used by the streaming page transform)."""
    tok_h, n_per_doc = _tokenize(texts)
    sh, counts = _shingle_hashes(tok_h, n_per_doc)
    return _simhash_from_shingles(sh, counts), _minhash_from_shingles(sh, counts, k)


def simhash(texts: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """uint64 SimHash per doc over w-token shingles (bit-vote majority).

    Empty/short docs → 0.
    """
    tok_h, n_per_doc = _tokenize(texts)
    sh, counts = _shingle_hashes(tok_h, n_per_doc)
    return _simhash_from_shingles(sh, counts)


def _simhash_from_shingles(sh: np.ndarray, counts: np.ndarray) -> np.ndarray:
    n_docs = len(counts)
    out = np.zeros(n_docs, dtype=np.uint64)
    if sh.size == 0:
        return out
    # per-bit contiguous segmented sums (majority of ±1 votes ⟺ 2·ones > n);
    # one 1D reduceat per bit — both 2D reduceat and cumsum variants are
    # 3-80x slower in this numpy build
    starts = _segment_starts(counts)
    nz = counts > 0
    s, c = starts[nz], counts[nz]
    packed = np.zeros(len(s), dtype=np.uint64)
    for b in range(64):
        # keep the bit column uint64: an astype(int64) here triples the
        # memory traffic of the whole loop (measured 3x slower)
        col = (sh >> np.uint64(b)) & np.uint64(1)
        ones = np.add.reduceat(col, s)
        packed |= (2 * ones.astype(np.int64) > c).astype(np.uint64) << np.uint64(b)
    out[nz] = packed
    return out


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Popcount of XOR for uint64 arrays (broadcasting ok)."""
    x = np.bitwise_xor(a, b)
    return np.unpackbits(
        np.ascontiguousarray(x).view(np.uint8).reshape(x.shape + (8,)), axis=-1
    ).sum(axis=-1)


def simhash_bands(sh: np.ndarray, n_bands: int = 4) -> np.ndarray:
    """(n, n_bands) uint64 band keys — equal bit slices of the simhash.

    Two docs within hamming distance < n_bands share ≥1 identical band
    (pigeonhole), so LSH-bucketing by band key finds all candidates.
    """
    width = 64 // n_bands
    mask = np.uint64((1 << width) - 1)
    out = np.empty((len(sh), n_bands), dtype=np.uint64)
    for b in range(n_bands):
        out[:, b] = (sh >> np.uint64(b * width)) & mask
    return out


def minhash_band_keys(sig: np.ndarray, n_bands: int = 16) -> np.ndarray:
    """(n, n_bands) uint64 LSH band keys from a (n, k) minhash matrix.

    rows_per_band = k // n_bands; band key = hash of the band's rows
    (wrapping multiply-add combine, deterministic).
    """
    n, k = sig.shape
    r = k // n_bands
    out = np.empty((n, n_bands), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for b in range(n_bands):
            acc = np.zeros(n, dtype=np.uint64)
            for j in range(r):
                acc = acc * np.uint64(0x9E3779B97F4A7C15) + sig[:, b * r + j].astype(np.uint64)
            # mix in the band index so identical row-values in different
            # bands don't collide
            out[:, b] = acc * np.uint64(2 * b + 1) + np.uint64(b)
    return out


def text_hash64(texts: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Stable uint64 content hash of the raw text (exact-dup key)."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    obj = np.asarray(texts.cast(pa.large_string()), dtype=object)
    if len(obj) == 0:
        return np.empty(0, dtype=np.uint64)
    return pd.util.hash_array(obj, hash_key=TOKEN_HASH_KEY, categorize=False).astype(np.uint64)


def jaccard_from_minhash(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Estimated Jaccard similarity between (.., k) signature arrays."""
    return (a == b).mean(axis=-1)
