"""Actor-pool text-analysis stages over a documents table: language-ID,
quality scoring, token counting, rolling-hash fingerprints.

Each stage is a callable CLASS for ``map_batches(Cls, concurrency=N)`` —
model/pattern state built once per actor in ``__init__`` (the T5/T6
stateful-stage pattern of the reference, SURVEY.md §2.3), vectorized
kernels from ``functions/textstats.py`` in ``__call__``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions import fingerprint as fp
from ..functions.textstats import (
    LangIdModel,
    bpe_ish_token_count,
    quality_features,
    rolling_fingerprint,
    whitespace_token_count,
)


class TextFeatureStage:
    """tokens / quality / fingerprint features per document."""

    def __init__(self, text_col: str = "text") -> None:
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        t = batch[self.text_col]
        feats = quality_features(t)
        out = batch
        out = out.append_column("n_tokens_ws", whitespace_token_count(t).cast(pa.int64()))
        out = out.append_column("n_tokens_bpe", bpe_ish_token_count(t).cast(pa.int64()))
        for name in ("mean_token_len", "punct_ratio", "stopword_ratio",
                     "upper_ratio", "digit_ratio", "quality_score"):
            out = out.append_column(name, pa.array(np.round(feats[name], 6), pa.float64()))
        out = out.append_column("doc_fingerprint", pa.array(rolling_fingerprint(t), pa.uint64()))
        out = out.append_column("simhash", pa.array(fp.simhash(t), pa.uint64()))
        return out


class LangIdStage:
    """Language-ID actor stage: marker tables compiled once per actor."""

    def __init__(self, text_col: str = "text", out_col: str = "lang_pred") -> None:
        self.text_col = text_col
        self.out_col = out_col
        self.model = LangIdModel()  # once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        pred = self.model.predict(batch[self.text_col])
        return batch.append_column(self.out_col, pa.array(pred, pa.string()))


class ModelScorerStage:
    """T6 with a REAL model artifact (reference: the per-fingerprint LLM
    scoring job, ``llm_job.py:254-332`` — model loaded once per worker,
    schema-enforced output per batch): a trained, int64-quantized
    softmax language model loaded from ``model_path`` in ``__init__``
    (once per actor), applied per batch as one bincount featurize + one
    exact integer matmul.  Exactness means the distributed actor-pool
    run is bit-identical to a single-process sweep for any batch size,
    pool size or replay — pinned by ``model_lang_score_check``."""

    def __init__(self, model_path: str, text_col: str = "text") -> None:
        from ..functions.model import load_lang_model

        self.model = load_lang_model(model_path)  # once per actor
        self.classes = np.asarray(self.model["classes"], dtype=object)
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.model import score_texts

        pred, best, margin = score_texts(batch[self.text_col], self.model)
        out = batch.append_column("model_lang",
                                  pa.array(self.classes[pred], pa.string()))
        out = out.append_column("model_score", pa.array(best, pa.int64()))
        return out.append_column("model_margin", pa.array(margin, pa.int64()))


# ---------------------------------------------------------------------------
# TF-IDF keyword extraction
# ---------------------------------------------------------------------------

def tfidf_doc_term_counts(batch: pa.Table, id_col: str = "doc_id",
                          text_col: str = "text") -> pa.Table:
    """Per-block (doc_id, term, c) rows: lowercase ``[a-z0-9]+`` tokens,
    counted per document (polars extract_all/explode — no Python row
    loop).  Rows are distinct (doc, term) pairs, so a downstream
    per-term row count IS the document frequency."""
    from ..functions.fingerprint import _polars

    pl = _polars()
    df = pl.DataFrame({
        "doc_id": pl.Series(batch[id_col].to_numpy(zero_copy_only=False)),
        "text": pl.from_arrow(batch[text_col].cast(pa.large_string())),
    })
    out = (
        df.with_columns(pl.col("text").str.to_lowercase()
                        .str.extract_all(r"[a-z0-9]+").alias("term"))
          .drop("text").explode("term").drop_nulls("term")
          .group_by(["doc_id", "term"]).len(name="c")
    )
    return pa.table({"doc_id": pa.array(out["doc_id"].to_numpy(), pa.int64()),
                     "term": pa.array(out["term"].to_list(), pa.string()),
                     "c": pa.array(out["c"].to_numpy(), pa.int64())})


def tfidf_attach_idf(t: pa.Table, n_docs: int) -> "pd.DataFrame":
    """Per term-partition sweep: every row of a term is co-located, so the
    partition row count per term is its global document frequency;
    idf = ln(n_docs / df) attaches without any broadcast."""
    import pandas as pd

    pdf = t.to_pandas()
    dfreq = pdf.groupby("term", sort=False)["c"].transform("size")
    pdf["idf"] = np.log(np.float64(n_docs) / dfreq.to_numpy())
    return pdf


def tfidf_top_term_sweep(t: pa.Table) -> "pd.DataFrame":
    """Per doc-partition sweep: score = c * idf, keep each document's
    top-scoring term (ties broken by term asc — multi-key stable sort,
    no per-group dispatch)."""
    import pandas as pd

    pdf = t.to_pandas()
    pdf["score"] = pdf["c"].to_numpy() * pdf["idf"].to_numpy()
    pdf = pdf.sort_values(["doc_id", "score", "term"],
                          ascending=[True, False, True], kind="mergesort")
    top = pdf.drop_duplicates("doc_id", keep="first")
    return pd.DataFrame({
        "doc_id": top["doc_id"].to_numpy(),
        "top_term": top["term"].to_numpy(),
        "score_cents": np.floor(top["score"].to_numpy() * 100.0 + 0.5)
                         .astype(np.int64),
    })


def doc_word_chunks(batch: pa.Table, k: int = 5, id_col: str = "doc_id",
                    text_col: str = "text") -> pa.Table:
    """Per-block (doc_id, chunk) rows: the document's words grouped into
    consecutive non-overlapping k-word chunks (trailing partial chunk
    dropped) — the C4-style unit for cross-document span dedup.  Split
    semantics match SQL ``string_split(text, ' ')`` (single-space split,
    empties preserved); fully vectorized in polars (split/explode/
    window-rank), no Python row loop."""
    from ..functions.fingerprint import _polars

    pl = _polars()
    df = pl.DataFrame({
        "doc_id": pl.Series(batch[id_col].to_numpy(zero_copy_only=False)),
        "text": pl.from_arrow(batch[text_col].cast(pa.large_string())),
    })
    out = (
        df.with_columns(pl.col("text").str.split(" ").alias("w")).drop("text")
          .explode("w")
          .with_columns((pl.int_range(pl.len()).over("doc_id") // k).alias("cid"))
          .group_by(["doc_id", "cid"], maintain_order=True)
          .agg(pl.col("w").str.join(" ").alias("chunk"), pl.len().alias("n"))
          .filter(pl.col("n") == k)
    )
    return pa.table({"doc_id": pa.array(out["doc_id"].to_numpy(), pa.int64()),
                     "chunk": pa.array(out["chunk"].to_list(), pa.string())})


# ---------------------------------------------------------------------------
# Exact-substring (overlapping k-gram) span dedup
# ---------------------------------------------------------------------------
# The ExactSubstr recipe of Lee et al. 2022 ("Deduplicating Training Data
# Makes Language Models Better"): any token span that occurs >= 2 times in
# the corpus is a duplicate span to cut.  The suffix-array construction of
# the paper is single-machine; the distributed shape here exchanges one row
# per OVERLAPPING k-token gram keyed by a 2x64-bit rolling-polynomial key
# (collision probability ~2^-128 per pair — the exchange never carries
# text), counts key occurrences inside hash partitions, and resolves the
# surviving positions to per-document merged span coverage.

_KGRAM_KEY1 = "0123456789123456"   # pandas siphash keys (16 bytes each);
_KGRAM_KEY2 = "fedcba9876543210"   # two independent 64-bit key streams
_KGRAM_M1 = np.uint64(0x9E3779B97F4A7C15)   # odd multipliers for the
_KGRAM_M2 = np.uint64(0xC2B2AE3D27D4EB4F)   # positional polynomial


def _token_rows(batch: pa.Table, id_col: str, text_col: str):
    """lowercase [a-z0-9]+ tokens of every doc in the batch, exploded in
    document order: (doc_ids_per_token, token pandas Series)."""
    from ..functions.fingerprint import _polars

    pl = _polars()
    df = pl.DataFrame({
        "doc_id": pl.Series(batch[id_col].to_numpy(zero_copy_only=False)),
        "text": pl.from_arrow(batch[text_col].cast(pa.large_string())),
    })
    out = (
        df.with_columns(pl.col("text").str.to_lowercase()
                        .str.extract_all(r"[a-z0-9]+").alias("tok"))
          .drop("text").explode("tok").drop_nulls("tok")
    )
    return out["doc_id"].to_numpy(), out["tok"].to_pandas()


def doc_kgram_rows(batch: pa.Table, k: int = 5, id_col: str = "doc_id",
                   text_col: str = "text") -> pa.Table:
    """Per-block (doc_id, pos, ka, kb) rows — one per overlapping k-token
    gram.  ka/kb are two independent rolling-polynomial combinations of
    per-token siphash values (vectorized: k shifted adds per key stream);
    a gram is valid when all k tokens fall inside one document."""
    import pandas as pd

    doc_ids, toks = _token_rows(batch, id_col, text_col)
    n = len(doc_ids)
    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "pos": pa.array([], pa.int64()),
                      "ka": pa.array([], pa.int64()),
                      "kb": pa.array([], pa.int64())})
    if n < k:
        return empty
    h1 = pd.util.hash_pandas_object(toks, index=False, hash_key=_KGRAM_KEY1).to_numpy()
    h2 = pd.util.hash_pandas_object(toks, index=False, hash_key=_KGRAM_KEY2).to_numpy()
    m = n - k + 1
    ka = np.zeros(m, dtype=np.uint64)
    kb = np.zeros(m, dtype=np.uint64)
    p1 = np.uint64(1)
    p2 = np.uint64(1)
    for j in range(k):
        ka += h1[j:j + m] * p1
        kb += h2[j:j + m] * p2
        # scalar uint64 wraparound is the intent; keep it warning-free
        p1 = np.uint64((int(p1) * int(_KGRAM_M1)) & 0xFFFFFFFFFFFFFFFF)
        p2 = np.uint64((int(p2) * int(_KGRAM_M2)) & 0xFFFFFFFFFFFFFFFF)
    valid = doc_ids[:m] == doc_ids[k - 1:]
    if not valid.any():
        return empty
    # per-document 0-based token position of each gram start
    starts = np.flatnonzero(np.r_[True, doc_ids[1:] != doc_ids[:-1]])
    doc_first = np.zeros(n, dtype=np.int64)
    doc_first[starts] = np.r_[starts[0], np.diff(starts)]
    doc_first = np.cumsum(doc_first)  # index of each token's doc start
    pos = np.arange(n, dtype=np.int64) - doc_first
    idx = np.flatnonzero(valid)
    return pa.table({"doc_id": pa.array(doc_ids[idx], pa.int64()),
                     "pos": pa.array(pos[idx], pa.int64()),
                     "ka": pa.array(ka[idx].view(np.int64), pa.int64()),
                     "kb": pa.array(kb[idx].view(np.int64), pa.int64())})


def kgram_dup_positions(t: pa.Table) -> "pd.DataFrame":
    """Per (ka, kb)-partition sweep: keep the positions of every gram key
    occurring >= 2 times in the corpus (all rows of a key are co-located
    here).  Output is (doc_id, pos) — the text never shuffles."""
    import pandas as pd

    pdf = t.to_pandas()
    sizes = pdf.groupby(["ka", "kb"], sort=False)["pos"].transform("size")
    return pdf.loc[sizes.to_numpy() >= 2, ["doc_id", "pos"]]


def kgram_span_sweep(t: pa.Table, k: int) -> "pd.DataFrame":
    """Per doc-partition sweep over the tagged union of per-doc token
    totals (tag 0, pos = total_tokens) and duplicate gram positions
    (tag 1): merge overlapping/adjacent [pos, pos+k-1] intervals into
    spans; dup_tokens = |coverage union|, dup_spans = merged-run count.
    Sorted-diff sweep + 1-D reduceat, no per-group dispatch."""
    import pandas as pd

    pdf = t.to_pandas()
    tot = pdf[pdf["tag"] == 0]
    dup = pdf[pdf["tag"] == 1].sort_values(["doc_id", "pos"], kind="mergesort")
    out = pd.DataFrame({"doc_id": tot["doc_id"].to_numpy(),
                        "total_tokens": tot["pos"].to_numpy()})
    if len(dup):
        d = dup["doc_id"].to_numpy()
        p = dup["pos"].to_numpy()
        first = np.r_[True, d[1:] != d[:-1]]
        diff = np.empty(len(p), dtype=np.int64)
        diff[0] = k
        diff[1:] = np.minimum(p[1:] - p[:-1], k)
        diff[first] = k
        starts = np.flatnonzero(first)
        cover = np.add.reduceat(diff, starts)
        # diff is clipped at k for coverage; spans need the unclipped gap
        gap = np.empty(len(p), dtype=np.int64)
        gap[0] = k + 1
        gap[1:] = p[1:] - p[:-1]
        gap[first] = k + 1
        spans = np.add.reduceat((gap > k).astype(np.int64), starts)
        stats = pd.DataFrame({"doc_id": d[starts], "dup_tokens": cover,
                              "dup_spans": spans})
        out = out.merge(stats, on="doc_id", how="left")
    else:
        out["dup_tokens"] = 0
        out["dup_spans"] = 0
    return pd.DataFrame({
        "doc_id": out["doc_id"].to_numpy(),
        "total_tokens": out["total_tokens"].to_numpy().astype(np.int64),
        "dup_tokens": np.nan_to_num(out["dup_tokens"].to_numpy(dtype=np.float64)).astype(np.int64),
        "dup_spans": np.nan_to_num(out["dup_spans"].to_numpy(dtype=np.float64)).astype(np.int64),
    })


# ---------------------------------------------------------------------------
# Winnowing document fingerprints (Schleimer, Wilkerson, Aiken 2003 —
# "Winnowing: Local Algorithms for Document Fingerprinting", the MOSS
# selection rule)
# ---------------------------------------------------------------------------

def winnow_rows(batch: pa.Table, k: int = 4, w: int = 4,
                id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """Selected winnowing fingerprints per document: k-token gram hashes,
    then for every window of w consecutive grams select the minimum hash
    (rightmost on ties — the paper's robust rule), keep distinct selected
    positions.  Guarantees: every match of length >= w+k-1 tokens shares
    a fingerprint; density ~ 2/(w+1).  Fully vectorized (one
    sliding_window_view argmin per batch); selection is local to the
    document, so only (doc_id, pos, fp) rows ever leave the stage."""
    import pandas as pd

    doc_ids, toks = _token_rows(batch, id_col, text_col)
    n = len(doc_ids)
    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "pos": pa.array([], pa.int64()),
                      "fp": pa.array([], pa.int64())})
    if n < k:
        return empty
    h = pd.util.hash_pandas_object(toks, index=False,
                                   hash_key=_KGRAM_KEY1).to_numpy()
    m = n - k + 1
    gh = np.zeros(m, dtype=np.uint64)
    p1 = np.uint64(1)
    for j in range(k):
        gh += h[j:j + m] * p1
        p1 = np.uint64((int(p1) * int(_KGRAM_M1)) & 0xFFFFFFFFFFFFFFFF)
    gvalid = doc_ids[:m] == doc_ids[k - 1:]
    gdoc = doc_ids[:m][gvalid]
    gh = gh[gvalid]
    # per-doc 0-based gram position
    if len(gdoc) == 0:
        return empty
    starts = np.flatnonzero(np.r_[True, gdoc[1:] != gdoc[:-1]])
    doc_first = np.zeros(len(gdoc), dtype=np.int64)
    doc_first[starts] = np.r_[starts[0], np.diff(starts)]
    gpos = np.arange(len(gdoc), dtype=np.int64) - np.cumsum(doc_first)
    if len(gh) < w:
        win_ok = np.zeros(0, dtype=bool)
    else:
        win_ok = gdoc[:len(gdoc) - w + 1] == gdoc[w - 1:]
    if not win_ok.any():
        # every doc has fewer than w grams: select each doc's min (the
        # paper treats short docs as one window)
        sel = []
        for s, e in zip(starts, np.r_[starts[1:], len(gdoc)]):
            seg = gh[s:e]
            j = int(len(seg) - 1 - np.argmin(seg[::-1]))
            sel.append(s + j)
        sel = np.asarray(sel, dtype=np.int64)
    else:
        sw = np.lib.stride_tricks.sliding_window_view(gh, w)
        rel = (w - 1) - np.argmin(sw[:, ::-1], axis=1)
        sel_all = np.arange(len(rel), dtype=np.int64) + rel
        sel = np.unique(sel_all[win_ok])
        # docs shorter than w grams contribute their single min
        seg_len = np.r_[starts[1:], len(gdoc)] - starts
        for s, L in zip(starts[seg_len < w], seg_len[seg_len < w]):
            seg = gh[s:s + L]
            j = int(L - 1 - np.argmin(seg[::-1]))
            sel = np.union1d(sel, np.int64(s + j))
    return pa.table({"doc_id": pa.array(gdoc[sel], pa.int64()),
                     "pos": pa.array(gpos[sel], pa.int64()),
                     "fp": pa.array(gh[sel].view(np.int64), pa.int64())})


def winnow_reference(doc_ids: np.ndarray, texts, k: int = 4,
                     w: int = 4) -> "pd.DataFrame":
    """Single-process per-doc LOOP implementation of robust winnowing
    (paper pseudocode: scan windows, record min with rightmost tie, skip
    re-records) sharing only the per-token hash kernel — the independent
    check for ``winnow_rows``'s vectorized selection."""
    import re

    import pandas as pd

    rows = []
    for d, t in zip(doc_ids, texts):
        t = t.as_py() if hasattr(t, "as_py") else t
        ts = re.findall(r"[a-z0-9]+", (t or "").lower())
        if len(ts) < k:
            continue
        th = pd.util.hash_pandas_object(pd.Series(ts), index=False,
                                        hash_key=_KGRAM_KEY1).to_numpy()
        gh = []
        for i in range(len(ts) - k + 1):
            v = np.uint64(0)
            p = np.uint64(1)
            for j in range(k):
                v = np.uint64((int(v) + int(th[i + j]) * int(p))
                              & 0xFFFFFFFFFFFFFFFF)
                p = np.uint64((int(p) * int(_KGRAM_M1)) & 0xFFFFFFFFFFFFFFFF)
            gh.append(int(v))
        sel = set()
        if len(gh) < w:
            best = len(gh) - 1
            for j in range(len(gh) - 1, -1, -1):
                if gh[j] < gh[best]:
                    best = j
            sel.add(best)
        else:
            for s in range(len(gh) - w + 1):
                best = s + w - 1
                for j in range(s + w - 1, s - 1, -1):
                    if gh[j] < gh[best]:
                        best = j
                sel.add(best)
        for i in sorted(sel):
            rows.append((d, i, np.uint64(gh[i]).astype(np.int64)))
    return pd.DataFrame(rows, columns=["doc_id", "pos", "fp"]) \
        .astype({"doc_id": "int64", "pos": "int64", "fp": "int64"})
