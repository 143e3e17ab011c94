"""Event-time window operators: tumbling / sliding / session assignment and
the per-(key, window) finalize computation.

Reference semantics being re-created (SURVEY.md §2.9):
- tumbling event-time windows, ``[start, end)`` — rows at ``ts == end``
  belong to the NEXT window (Flink tumbling windows; mirrored by the join
  predicate ``start_ms <= ts < end_ms`` at
  ``src/postprocess/save_fingerprints.py:148``);
- per-window stats = ``{min, max, median, mean, std_dev}`` with the n==1
  → ``std_dev = 0.0`` rule (``src/flink_job/aggregations.py:6-16``);
- window output id: the reference draws ``uuid4`` per window
  (``src/flink_job/serialization.py:31``); for deterministic output-row
  parity we derive ``fingerprint_id = hash(key, kind, window_start,
  window_end)`` (SURVEY.md §7.4.1).

Assignment is vectorized numpy over ``warc_ts``-as-int64-ms columns and is
meant to run inside ``map_batches(batch_format="pyarrow")``.  Sliding
windows EXPLODE each row into ``size/slide`` (window_start, row) pairs via
a `take`-index repeat — no per-row Python.  Session windows need per-key
ordered scans and live in ``map_groups`` / the state actor
(generalization of the reference's downtime machine,
``src/data_input/process_odr.py:1028-1088``, and streak logic,
``process_odr.py:269-303``).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd


# ---------------------------------------------------------------------------
# Assignment
# ---------------------------------------------------------------------------

def tumbling_window_start(ts_ms: np.ndarray, size_ms: int) -> np.ndarray:
    """window_start for each ts under tumbling windows of `size_ms`."""
    return (ts_ms // size_ms) * size_ms


def sliding_window_starts(ts_ms: np.ndarray, size_ms: int, slide_ms: int):
    """Explode rows into overlapping sliding windows.

    Returns (take_idx, window_start): row i appears len(size/slide) times
    (fewer near domain edges is NOT applied — Flink emits all overlapping
    windows), with window_start values w such that w <= ts < w + size and
    w ≡ 0 (mod slide).
    """
    if size_ms % slide_ms != 0:
        raise ValueError("size_ms must be a multiple of slide_ms")
    n_over = size_ms // slide_ms
    last = (ts_ms // slide_ms) * slide_ms  # latest window containing ts
    # windows: last, last-slide, ..., last-(n_over-1)*slide (those with w+size > ts)
    offs = (np.arange(n_over, dtype=np.int64) * slide_ms)[None, :]
    starts = last[:, None] - offs  # (n, n_over)
    take_idx = np.repeat(np.arange(len(ts_ms), dtype=np.int64), n_over)
    return take_idx, starts.ravel()


def sessionize_sorted(ts_ms_sorted: np.ndarray, gap_ms: int) -> np.ndarray:
    """Session ids (0..k-1) for an ALREADY ts-sorted array: a new session
    starts when the gap to the previous event is > gap_ms (strict, matching
    the `ts - lag(ts) > gap` SQL oracle)."""
    if len(ts_ms_sorted) == 0:
        return np.empty(0, dtype=np.int64)
    gaps = np.diff(ts_ms_sorted) > gap_ms
    return np.concatenate(([0], np.cumsum(gaps))).astype(np.int64)


# ---------------------------------------------------------------------------
# Stats (exact parity with src/flink_job/aggregations.py:6-16)
# ---------------------------------------------------------------------------

def compute_stats(values: np.ndarray) -> dict[str, float]:
    """min/max/median/mean/std over one window's values.

    Pinned reduction order (sort ascending first) so engine and oracle
    produce bit-identical floats regardless of row arrival order
    (SURVEY.md §7.4.1). std is population std (statistics.pstdev analog)
    with the reference's n==1 → 0.0 rule (aggregations.py:15).
    """
    v = np.sort(np.asarray(values, dtype=np.float64), kind="stable")
    n = len(v)
    if n == 0:
        return {"min": 0.0, "max": 0.0, "median": 0.0, "mean": 0.0, "std_dev": 0.0}
    mean = float(np.mean(v))
    std = 0.0 if n == 1 else float(np.std(v))
    return {
        "min": float(v[0]),
        "max": float(v[-1]),
        "median": float(np.median(v)),
        "mean": mean,
        "std_dev": std,
    }


def fingerprint_id(key_lang: str, key_host: str, kind: str, start_ms: int, end_ms: int) -> str:
    """Deterministic window id replacing the reference's uuid4
    (serialization.py:31) — sha1 over the window identity."""
    h = hashlib.sha1(
        f"{key_lang}|{key_host}|{kind}|{start_ms}|{end_ms}".encode()
    ).hexdigest()
    return h[:32]


# ---------------------------------------------------------------------------
# In-window duplicate-cluster counting
# ---------------------------------------------------------------------------

class _UnionFind:
    __slots__ = ("p",)

    def __init__(self, n: int) -> None:
        self.p = list(range(n))

    def find(self, x: int) -> int:
        p = self.p
        while p[x] != x:
            p[x] = p[p[x]]
            x = p[x]
        return x

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.p[max(ra, rb)] = min(ra, rb)


def dup_cluster_counts(
    text_hash: np.ndarray,
    band_keys: np.ndarray,
    minhash_sig: np.ndarray,
    jaccard_threshold: float = 0.8,
) -> tuple[int, int, int]:
    """(exact_dup_count, near_dup_count, dup_cluster_count) within one
    window group.

    * exact_dup_count   = n_docs − n_distinct(text_hash)
    * clusters: union docs sharing a minhash LSH band key whose estimated
      Jaccard (signature agreement) ≥ threshold, plus exact-hash edges;
      dup_cluster_count = #clusters of size ≥ 2,
      near_dup_count    = redundant docs = Σ(size−1) over those clusters.

    Groups are window-sized (small); the candidate-pair confirm loop is
    per-bucket and bounded.  The window-level counts are the target analog
    of the reference's per-tag stats map (aggregations.py:6-16).
    """
    n = len(text_hash)
    if n == 0:
        return 0, 0, 0
    exact = int(n - len(np.unique(text_hash)))
    uf = _UnionFind(n)
    # exact-hash edges (vectorized grouping)
    order = np.argsort(text_hash, kind="stable")
    th = text_hash[order]
    same = np.flatnonzero(th[1:] == th[:-1])
    for i in same:
        uf.union(int(order[i]), int(order[i + 1]))
    # LSH band buckets → confirm with signature jaccard
    n_bands = band_keys.shape[1]
    for b in range(n_bands):
        col = band_keys[:, b]
        order = np.argsort(col, kind="stable")
        cb = col[order]
        # bucket boundaries
        starts = np.flatnonzero(np.concatenate(([True], cb[1:] != cb[:-1])))
        ends = np.concatenate((starts[1:], [n]))
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            idx = order[s:e]
            anchor = idx[0]
            for j in idx[1:]:
                if uf.find(int(anchor)) == uf.find(int(j)):
                    continue
                sim = float((minhash_sig[anchor] == minhash_sig[j]).mean())
                if sim >= jaccard_threshold:
                    uf.union(int(anchor), int(j))
    roots = np.fromiter((uf.find(i) for i in range(n)), dtype=np.int64, count=n)
    _, counts = np.unique(roots, return_counts=True)
    big = counts[counts >= 2]
    return exact, int((big - 1).sum()), int(len(big))


def finalize_many(df: pd.DataFrame) -> pd.DataFrame:
    """Finalize ALL (key, window) groups inside one hash partition with a
    single sorted sweep — the fast path that replaces per-group
    ``map_groups`` dispatch (which costs ~1-2 ms per window; real corpora
    have 10^5+ windows per epoch).

    Input: the same per-row columns as ``finalize_window_group``; output:
    one F3-schema fingerprint row per (key_lang, key_host, window_kind,
    window_start) group.  Group math is identical to the oracle's
    (``compute_stats`` + ``dup_cluster_counts``) so parity is preserved.
    """
    if len(df) == 0:
        return pd.DataFrame()
    band_cols = [c for c in df.columns if c.startswith("band_")]
    mh_cols = [c for c in df.columns if c.startswith("mh_")]
    df = df.sort_values(
        ["key_lang", "key_host", "window_kind", "window_start"], kind="stable"
    )
    lang = df["key_lang"].to_numpy()
    host = df["key_host"].to_numpy()
    kind = df["window_kind"].to_numpy()
    ws = df["window_start"].to_numpy()
    we = df["window_end"].to_numpy()
    tlen = df["text_len"].to_numpy(dtype=np.float64)
    thash = df["text_hash"].to_numpy(dtype=np.uint64)
    bands = df[band_cols].to_numpy(dtype=np.uint64)
    sig = df[mh_cols].to_numpy(dtype=np.uint32)

    n = len(df)
    new_group = np.ones(n, dtype=bool)
    new_group[1:] = (
        (lang[1:] != lang[:-1]) | (host[1:] != host[:-1])
        | (kind[1:] != kind[:-1]) | (ws[1:] != ws[:-1])
    )
    starts = np.flatnonzero(new_group)
    ends = np.append(starts[1:], n)

    out: list[dict] = []
    for s, e in zip(starts, ends):
        exact, near, clusters = dup_cluster_counts(thash[s:e], bands[s:e], sig[s:e])
        stats = compute_stats(tlen[s:e])
        start_i, end_i = int(ws[s]), int(we[s])
        out.append({
            "fingerprint_id": fingerprint_id(str(lang[s]), str(host[s]), str(kind[s]), start_i, end_i),
            "key_lang": lang[s],
            "key_host": host[s],
            "window_kind": kind[s],
            "window_start": start_i,
            "window_end": end_i,
            "doc_count": int(e - s),
            "exact_dup_count": exact,
            "near_dup_count": near,
            "dup_cluster_count": clusters,
            "min_len": stats["min"],
            "max_len": stats["max"],
            "median_len": stats["median"],
            "mean_len": stats["mean"],
            "std_len": stats["std_dev"],
        })
    return pd.DataFrame(out)


def finalize_window_group(g: pd.DataFrame) -> pd.DataFrame:
    """Per-(key_lang, key_host, window_kind, window_start) finalize, run in
    ``groupby(...).map_groups(..., batch_format="pandas")``.

    Expects columns: key_lang, key_host, window_kind, window_start,
    window_end, text_len, text_hash, band_0..band_{B-1}, mh_0..mh_{K-1}
    (flattened signature). Emits one fingerprint row (F3 schema).
    """
    first = g.iloc[0]
    band_cols = [c for c in g.columns if c.startswith("band_")]
    mh_cols = [c for c in g.columns if c.startswith("mh_")]
    band_keys = g[band_cols].to_numpy(dtype=np.uint64)
    sig = g[mh_cols].to_numpy(dtype=np.uint32)
    text_hash = g["text_hash"].to_numpy(dtype=np.uint64)
    exact, near, clusters = dup_cluster_counts(text_hash, band_keys, sig)
    stats = compute_stats(g["text_len"].to_numpy())
    start = int(first["window_start"])
    end = int(first["window_end"])
    return pd.DataFrame(
        [
            {
                "fingerprint_id": fingerprint_id(
                    str(first["key_lang"]), str(first["key_host"]),
                    str(first["window_kind"]), start, end
                ),
                "key_lang": first["key_lang"],
                "key_host": first["key_host"],
                "window_kind": first["window_kind"],
                "window_start": start,
                "window_end": end,
                "doc_count": int(len(g)),
                "exact_dup_count": exact,
                "near_dup_count": near,
                "dup_cluster_count": clusters,
                "min_len": stats["min"],
                "max_len": stats["max"],
                "median_len": stats["median"],
                "mean_len": stats["mean"],
                "std_len": stats["std_dev"],
            }
        ]
    )
