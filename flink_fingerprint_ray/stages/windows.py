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


def cumulate_window_slices(ts_ms: np.ndarray, step_ms: int, max_ms: int):
    """Explode rows into Flink CUMULATE windows (public Flink SQL window
    TVF semantics): a row at ts belongs to every (start, end) with
    start = floor(ts/max)*max and end = start + k*step for each step
    boundary strictly after ts (k rises to max/step, where the cumulate
    window coincides with the tumbling max-span window).

    Returns (take_idx, window_start, window_end); row i appears once per
    remaining slice.  Identity needs BOTH bounds — slices share a start.
    """
    if max_ms % step_ms != 0:
        raise ValueError("max_ms must be a multiple of step_ms")
    n_slices = max_ms // step_ms
    start = (ts_ms // max_ms) * max_ms
    k0 = (ts_ms - start) // step_ms + 1          # first emitting slice
    reps = (n_slices - k0 + 1).astype(np.int64)
    take_idx = np.repeat(np.arange(len(ts_ms), dtype=np.int64), reps)
    offs = np.arange(len(take_idx), dtype=np.int64) - np.repeat(
        np.concatenate(([0], np.cumsum(reps)[:-1])), reps)
    k = k0[take_idx] + offs
    starts = start[take_idx]
    return take_idx, starts, starts + k * step_ms


def sessionize_sorted(ts_ms_sorted: np.ndarray, gap_ms: int) -> np.ndarray:
    """Session ids (0..k-1) for an ALREADY ts-sorted array: a new session
    starts when the gap to the previous event is > gap_ms (strict, matching
    the `ts - lag(ts) > gap` SQL oracle)."""
    if len(ts_ms_sorted) == 0:
        return np.empty(0, dtype=np.int64)
    gaps = np.diff(ts_ms_sorted) > gap_ms
    return np.concatenate(([0], np.cumsum(gaps))).astype(np.int64)


def dynamic_session_segments(
    ts_sorted: np.ndarray, gap_ms_sorted: np.ndarray, key_change: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Per-ELEMENT-gap session segmentation (the Flink
    ``SessionWindowTimeGapExtractor`` semantics) over key-blocked,
    ts-sorted rows: each element spans [ts, ts + gap); spans of the same
    key merge while the next element's ts does not exceed the running
    session end max(ts_i + gap_i).  For a constant gap this reduces
    exactly to the fixed-gap rule (break iff ts - prev_ts > gap,
    window_end = last_ts + gap), so the two paths share one oracle.

    Returns ``(new_seg, running_end)``: new_seg[i] marks session starts;
    running_end[i] is the per-key running max of (ts + gap), whose value
    at a session's LAST row is that session's window_end.

    A per-KEY (not per-session) running max is exact: at any break j,
    ts[j] > running[j-1] implies end[j] = ts[j] + gap[j] > running[j-1],
    so the cummax from j onward is determined solely by current-session
    spans — contamination from the key's earlier sessions never survives
    a break.  The per-key loop is over CONTIGUOUS 1-D slices (this
    build's segmented-reduction idiom); work per key is one vectorized
    accumulate."""
    n = len(ts_sorted)
    if n == 0:
        return (np.empty(0, dtype=bool), np.empty(0, dtype=np.int64))
    new_seg = key_change.copy()
    new_seg[0] = True
    running = (np.asarray(ts_sorted, dtype=np.int64)
               + np.asarray(gap_ms_sorted, dtype=np.int64))
    starts = np.flatnonzero(new_seg)
    stops = np.append(starts[1:], n)
    for a, b in zip(starts.tolist(), stops.tolist()):
        if b - a > 1:
            r = np.maximum.accumulate(running[a:b])
            new_seg[a + 1:b] = ts_sorted[a + 1:b] > r[:-1]
            running[a:b] = r
    return new_seg, running


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
    # SEQUENTIAL sums via single-segment reduceat — the exact reduction
    # the vectorized segment path (finalize_many) performs per group, so
    # scalar (oracle) and segmented (engine) floats are bit-identical
    # (np.mean/np.std pairwise summation would differ in the last ulp)
    seg0 = np.array([0], dtype=np.int64)
    mean = float(np.add.reduceat(v, seg0)[0] / n)
    if n == 1:
        std = 0.0
    else:
        dev = v - mean
        std = float(np.sqrt(np.add.reduceat(dev * dev, seg0)[0] / n))
    half = n // 2
    median = float(v[half]) if n % 2 else float(0.5 * (v[half - 1] + v[half]))
    return {
        "min": float(v[0]),
        "max": float(v[-1]),
        "median": median,
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

_KIND_CODE = {"tumbling": 0, "sliding": 1, "session": 2, "cumulate": 3}


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


def dup_cluster_counts_many(
    gid: np.ndarray,
    thash: np.ndarray,
    bands: np.ndarray,
    sig: np.ndarray,
    n_groups: int,
    jaccard_threshold: float = 0.8,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized ``dup_cluster_counts`` across MANY groups at once.

    ``gid`` assigns each row to its (key, window) group.  Produces the
    identical (exact, near, cluster) counts per group: same anchor rule
    (lowest row index of each in-group LSH bucket), same confirm
    predicate; the per-group union-find shortcut in the scalar version
    only skips redundant unions, so connectivity — and therefore counts —
    is unchanged.
    """
    n = len(gid)
    exact = np.zeros(n_groups, dtype=np.int64)
    near = np.zeros(n_groups, dtype=np.int64)
    clusters = np.zeros(n_groups, dtype=np.int64)
    if n == 0:
        return exact, near, clusters

    # exact dups: group size − distinct text hashes, via one (gid, hash) sort
    order = np.lexsort((thash, gid))
    g_s, t_s = gid[order], thash[order]
    same = np.zeros(n, dtype=bool)
    same[1:] = (g_s[1:] == g_s[:-1]) & (t_s[1:] == t_s[:-1])
    np.add.at(exact, g_s[same], 1)
    # exact-hash edges: consecutive equal-hash rows within a group
    ea = [order[:-1][same[1:]]]
    eb = [order[1:][same[1:]]]

    # LSH band buckets: anchor = lowest row index in the (gid, band) bucket
    for b in range(bands.shape[1]):
        col = bands[:, b]
        o = np.lexsort((col, gid))  # stable: row index ascending inside ties
        gb, cb = gid[o], col[o]
        nb = np.ones(n, dtype=bool)
        nb[1:] = (gb[1:] != gb[:-1]) | (cb[1:] != cb[:-1])
        anchor = np.maximum.accumulate(np.where(nb, np.arange(n), 0))
        cand = np.flatnonzero(~nb)
        if len(cand) == 0:
            continue
        anc_rows, cand_rows = o[anchor[cand]], o[cand]
        sim = (sig[anc_rows] == sig[cand_rows]).mean(axis=1)
        hit = sim >= jaccard_threshold
        ea.append(anc_rows[hit])
        eb.append(cand_rows[hit])

    ea_all = np.concatenate(ea)
    eb_all = np.concatenate(eb)
    if len(ea_all):
        uf = _UnionFind(n)
        for a, b2 in zip(ea_all.tolist(), eb_all.tolist()):
            uf.union(a, b2)
        roots = np.fromiter((uf.find(i) for i in range(n)), dtype=np.int64, count=n)
        # cluster sizes per (gid, root); roots never cross groups
        ro = np.lexsort((roots, gid))
        gr, rr = gid[ro], roots[ro]
        new_c = np.ones(n, dtype=bool)
        new_c[1:] = (gr[1:] != gr[:-1]) | (rr[1:] != rr[:-1])
        cid = np.cumsum(new_c) - 1
        sizes = np.bincount(cid)
        big = sizes >= 2
        c_gid = gr[new_c]
        np.add.at(clusters, c_gid[big], 1)
        np.add.at(near, c_gid[big], sizes[big] - 1)
    return exact, near, clusters


def finalize_many(table) -> pd.DataFrame:
    """Finalize ALL (key, window) groups inside one hash partition with a
    single sorted sweep — the fast path that replaces per-group
    ``map_groups`` dispatch (which costs ~1-2 ms per window; real corpora
    have 10^5+ windows per epoch).

    Input: a pa.Table (or DataFrame) with the same per-row columns as
    ``finalize_window_group``; output: one F3-schema fingerprint row per
    (key_lang, key_host, window_kind, window_start) group.  Group math is
    identical to the oracle's (``compute_stats`` + ``dup_cluster_counts``)
    so parity is preserved.

    The sort is a NUMERIC lexsort over (key_hash, kind_code, window_start)
    — no object-string comparisons; group boundaries still compare the
    actual key strings, and the astronomically-rare uint64 key-hash
    collision inside one (hash, kind, start) tie is repaired by a stable
    string sub-sort of that tie.
    """
    import pyarrow as _pa

    if isinstance(table, pd.DataFrame):
        table = _pa.Table.from_pandas(table, preserve_index=False)
    n = table.num_rows
    if n == 0:
        return pd.DataFrame()
    lang = np.asarray(table["key_lang"], dtype=object)
    host = np.asarray(table["key_host"], dtype=object)
    kind = np.asarray(table["window_kind"], dtype=object)
    ws = table["window_start"].to_numpy()
    we = table["window_end"].to_numpy()
    tlen = table["text_len"].to_numpy().astype(np.float64)
    thash = table["text_hash"].to_numpy().astype(np.uint64)
    khash = table["key_hash"].to_numpy().astype(np.uint64)
    if "sig" in table.column_names:  # packed fixed-size-list layout
        bc = table["bands"].combine_chunks()
        bands = np.asarray(bc.flatten()).reshape(n, -1).astype(np.uint64, copy=False)
        sc = table["sig"].combine_chunks()
        sig = np.asarray(sc.flatten()).reshape(n, -1).astype(np.uint32, copy=False)
    else:  # legacy flat band_*/mh_* columns
        band_cols = [c for c in table.column_names if c.startswith("band_")]
        mh_cols = [c for c in table.column_names if c.startswith("mh_")]
        bands = np.column_stack([table[c].to_numpy() for c in band_cols]).astype(np.uint64)
        sig = np.column_stack([table[c].to_numpy() for c in mh_cols]).astype(np.uint32)

    # window_end participates in identity: cumulate slices share a start
    # and differ only in end (for the other kinds end is a function of
    # (kind, start), so including it is a no-op)
    kind_code = pd.Series(kind).map(_KIND_CODE).fillna(4).to_numpy(dtype=np.int8)
    order = np.lexsort((we, ws, kind_code, khash))
    lang, host, kind = lang[order], host[order], kind[order]
    ws, we, tlen, thash = ws[order], we[order], tlen[order], thash[order]
    khash_s, kind_code = khash[order], kind_code[order]
    bands, sig = bands[order], sig[order]
    # collision check: a (lang, host) change INSIDE a (hash, kind, ws) tie
    # means two keys share a uint64 hash (p ~ n²/2^64) — rare path: redo
    # with an exact object-key sort
    tie = np.zeros(n, dtype=bool)
    tie[1:] = (
        (khash_s[1:] == khash_s[:-1]) & (kind_code[1:] == kind_code[:-1])
        & (ws[1:] == ws[:-1]) & (we[1:] == we[:-1])
    )
    frag = tie & np.concatenate(([False], (lang[1:] != lang[:-1]) | (host[1:] != host[:-1])))
    if frag.any():
        order2 = np.lexsort((we, ws, kind, host, lang))
        lang, host, kind = lang[order2], host[order2], kind[order2]
        ws, we, tlen, thash = ws[order2], we[order2], tlen[order2], thash[order2]
        bands, sig = bands[order2], sig[order2]
    new_group = np.ones(n, dtype=bool)
    new_group[1:] = (
        (lang[1:] != lang[:-1]) | (host[1:] != host[:-1])
        | (kind[1:] != kind[:-1]) | (ws[1:] != ws[:-1]) | (we[1:] != we[:-1])
    )
    starts = np.flatnonzero(new_group)
    ends = np.append(starts[1:], n)
    sizes = ends - starts

    # Vectorized per-group stats: one lexsort puts tlen ascending inside
    # each group segment, then segmented 1-D reduceat reductions produce
    # EXACTLY compute_stats' outputs (same ascending order, same
    # sequential per-segment summation — see compute_stats) with no
    # per-group Python.  (1-D contiguous reduceat is fast on this numpy
    # build; 2-D reduceat/cumsum are not.)
    g_lang, g_host, g_kind = lang[starts], host[starts], kind[starts]
    g_ws, g_we = ws[starts].astype(np.int64), we[starts].astype(np.int64)
    n_g = len(starts)
    gid_row = np.repeat(np.arange(n_g), sizes)
    stat_order = np.lexsort((tlen, gid_row))
    tl_s = tlen[stat_order]
    starts64 = starts.astype(np.int64)
    sums = np.add.reduceat(tl_s, starts64)
    min_a = tl_s[starts]
    max_a = tl_s[ends - 1]
    mean_a = sums / sizes
    half = starts + sizes // 2
    med_a = np.where(sizes % 2 == 1, tl_s[half],
                     0.5 * (tl_s[np.maximum(half - 1, starts)] + tl_s[half]))
    dev = tl_s - np.repeat(mean_a, sizes)
    std_a = np.sqrt(np.add.reduceat(dev * dev, starts64) / sizes)
    std_a[sizes == 1] = 0.0  # n==1 -> 0.0 rule (aggregations.py:15)

    exact_a = np.zeros(n_g, dtype=np.int64)
    near_a = np.zeros(n_g, dtype=np.int64)
    clus_a = np.zeros(n_g, dtype=np.int64)
    multi_mask = sizes > 1
    multi = np.flatnonzero(multi_mask)
    if len(multi):
        # dup counts for ALL multi-row groups in one vectorized pass
        # (row order inside groups is the group-sorted arrival order the
        # oracle uses — the stats sort above works on a separate copy)
        m_rows = np.flatnonzero(multi_mask[gid_row])
        comp = np.cumsum(multi_mask) - 1
        m_gid = comp[gid_row[m_rows]]
        ex_m, ne_m, cl_m = dup_cluster_counts_many(
            m_gid, thash[m_rows], bands[m_rows], sig[m_rows], len(multi)
        )
        exact_a[multi], near_a[multi], clus_a[multi] = ex_m, ne_m, cl_m

    # per-WINDOW sha1 (not per row): stdlib hashlib has no batch API and
    # numpy no sha1 kernel; at ~1 µs/digest this is ≤0.1 s even when a
    # partition closes 10^5 windows — two orders below the stats/cluster
    # sweeps above.  Swapping to a vectorized non-crypto hash would tie
    # the PERSISTED output ids to a library's hash stability (the polars
    # lesson in ADVICE r2) for no measurable win.
    fids = [
        fingerprint_id(str(la), str(ho), str(ki), int(s_), int(e_))
        for la, ho, ki, s_, e_ in zip(g_lang, g_host, g_kind, g_ws, g_we)
    ]
    return pd.DataFrame({
        "fingerprint_id": fids,
        "key_lang": g_lang,
        "key_host": g_host,
        "window_kind": g_kind,
        "window_start": g_ws,
        "window_end": g_we,
        "doc_count": sizes.astype(np.int64),
        "exact_dup_count": exact_a,
        "near_dup_count": near_a,
        "dup_cluster_count": clus_a,
        "min_len": min_a,
        "max_len": max_a,
        "median_len": med_a,
        "mean_len": mean_a,
        "std_len": std_a,
    })


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
