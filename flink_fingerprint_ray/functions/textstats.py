"""Text-analysis kernels for large-scale training-data pipelines:
language-ID (n-gram heuristic), quality scoring (length / punctuation /
stopword ratios), token counting, and rolling-hash document
fingerprinting.  All vectorized; designed for ``map_batches`` with
``batch_format="pyarrow"``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# ---------------------------------------------------------------------------
# Token counting
# ---------------------------------------------------------------------------

# BPE-ish: words, numbers, or single non-space symbols (RE2-safe pattern)
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def whitespace_token_count(texts: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Tokens = maximal runs of non-whitespace (matches DuckDB's
    ``length(regexp_extract_all(text, '\\S+'))`` for oracle parity)."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    return pc.count_substring_regex(texts.cast(pa.large_string()), r"\S+")


def bpe_ish_token_count(texts: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Count of BPE-ish tokens (letter runs, digit runs, single symbols)."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    return pc.count_substring_regex(texts.cast(pa.large_string()), BPE_ISH_PATTERN)


# ---------------------------------------------------------------------------
# Quality scoring
# ---------------------------------------------------------------------------

STOPWORDS = (
    "the a an and or of to in is are was be on for with as at by it this that "
    "from not have has had but they you we he she i"
).split()


def quality_features(texts: pa.Array | pa.ChunkedArray) -> dict[str, np.ndarray]:
    """Vectorized per-doc quality features.

    Returns dict of equal-length numpy arrays:
      n_chars, n_tokens, mean_token_len, punct_ratio, stopword_ratio,
      upper_ratio, digit_ratio, quality_score (simple composite in [0,1]).
    """
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    t = texts.cast(pa.large_string())
    n_chars = pc.utf8_length(t).to_numpy(zero_copy_only=False).astype(np.float64)
    n_tokens = pc.count_substring_regex(t, r"\S+").to_numpy(zero_copy_only=False).astype(np.float64)
    n_punct = pc.count_substring_regex(t, r"[\.,;:!\?\"'\(\)\[\]]").to_numpy(zero_copy_only=False).astype(np.float64)
    n_upper = pc.count_substring_regex(t, r"[A-Z]").to_numpy(zero_copy_only=False).astype(np.float64)
    n_digit = pc.count_substring_regex(t, r"[0-9]").to_numpy(zero_copy_only=False).astype(np.float64)
    # stopword hits: exact token membership (split on whitespace, count
    # tokens in the stopword set) — boundary-regex counting differs
    # between Arrow (overlapping restarts) and RE2-consuming engines, so
    # membership is the portable, SQL-mirrorable semantics
    low = pc.utf8_lower(t)
    toks = pc.split_pattern_regex(low, r"\s+")
    flat = toks.flatten()
    n_per = pc.list_value_length(toks).fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64)
    hits = pc.is_in(flat, value_set=pa.array(STOPWORDS)).to_numpy(zero_copy_only=False)
    doc_ids = np.repeat(np.arange(len(n_per)), n_per)
    n_stop = np.bincount(doc_ids[hits], minlength=len(n_per)).astype(np.float64)

    safe_tokens = np.maximum(n_tokens, 1.0)
    safe_chars = np.maximum(n_chars, 1.0)
    # whitespace chars ≈ n_tokens - 1 for single-space text; use exact count
    n_ws = pc.count_substring_regex(t, r"\s").to_numpy(zero_copy_only=False).astype(np.float64)
    mean_token_len = (n_chars - n_ws) / safe_tokens
    punct_ratio = n_punct / safe_chars
    stopword_ratio = n_stop / safe_tokens
    upper_ratio = n_upper / safe_chars
    digit_ratio = n_digit / safe_chars
    # composite heuristic: reward moderate length + stopword presence,
    # penalize punctuation/digit soup
    length_score = np.clip(n_tokens / 20.0, 0.0, 1.0)
    quality = np.clip(
        0.4 * length_score
        + 0.3 * np.clip(stopword_ratio * 5.0, 0.0, 1.0)
        + 0.3 * (1.0 - np.clip(punct_ratio * 5.0 + digit_ratio * 2.0, 0.0, 1.0)),
        0.0,
        1.0,
    )
    return {
        "n_chars": n_chars.astype(np.int64),
        "n_tokens": n_tokens.astype(np.int64),
        "mean_token_len": mean_token_len,
        "punct_ratio": punct_ratio,
        "stopword_ratio": stopword_ratio,
        "upper_ratio": upper_ratio,
        "digit_ratio": digit_ratio,
        "quality_score": quality,
    }


# ---------------------------------------------------------------------------
# Language ID (character n-gram heuristic)
# ---------------------------------------------------------------------------

# tiny per-language trigram marker sets (deterministic heuristic — a real
# deployment would load fasttext lid in an actor-pool __init__; the model
# file is not available in this container so the heuristic is the default)
_LANG_MARKERS = {
    "en": [" the ", " and ", " of ", "ing ", " to "],
    "de": [" der ", " und ", " die ", " ist ", "sch"],
    "fr": [" le ", " la ", " les ", " est ", " de "],
    "es": [" el ", " la ", " que ", " los ", "ción"],
    "it": [" il ", " che ", " di ", " per ", "zione"],
}


class LangIdModel:
    """Stateful language-ID stage: compile patterns once per actor.

    Use as ``ds.map_batches(LangIdStage, concurrency=N)`` via
    stages.textops; this class is the pure model (testable sans Ray).
    """

    def __init__(self) -> None:
        self.langs = list(_LANG_MARKERS)
        self.markers = _LANG_MARKERS

    def predict(self, texts: pa.Array | pa.ChunkedArray) -> np.ndarray:
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        low = pc.utf8_lower(texts.cast(pa.large_string()))
        scores = np.zeros((len(low), len(self.langs)), dtype=np.int64)
        for j, lang in enumerate(self.langs):
            for m in self.markers[lang]:
                scores[:, j] += pc.count_substring(low, m).to_numpy(zero_copy_only=False)
        best = scores.argmax(axis=1)
        none = scores.max(axis=1) == 0
        out = np.array(self.langs, dtype=object)[best]
        out[none] = "und"
        return out


# ---------------------------------------------------------------------------
# Rolling-hash document fingerprint (winnowing-style)
# ---------------------------------------------------------------------------

def rolling_fingerprint(texts: pa.Array | pa.ChunkedArray, window: int = 4) -> np.ndarray:
    """uint64 document fingerprint: min-sampled rolling hash over token
    windows (winnowing flavour; Schleimer et al., SIGMOD'03 — public).

    Deterministic; robust to small edits away from the minimum window.
    """
    from .fingerprint import _shingle_hashes, _tokenize, _segment_starts

    tok_h, n_per_doc = _tokenize(texts)
    sh, counts = _shingle_hashes(tok_h, n_per_doc, w=window)
    out = np.zeros(len(counts), dtype=np.uint64)
    if sh.size == 0:
        return out
    starts = _segment_starts(counts)
    nz = counts > 0
    out[nz] = np.minimum.reduceat(sh, starts[nz])
    return out


def ngram_set_hashes(texts: pa.Array | pa.ChunkedArray, n: int = 3) -> tuple[np.ndarray, np.ndarray]:
    """Flat (hashes, per_doc_counts) of token n-gram hashes — the exact
    building block for n-gram Jaccard similarity (stages/dedup.py)."""
    from .fingerprint import _shingle_hashes, _tokenize

    tok_h, n_per_doc = _tokenize(texts)
    return _shingle_hashes(tok_h, n_per_doc, w=n)
