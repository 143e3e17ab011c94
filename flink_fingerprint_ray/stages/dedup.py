"""Deduplication suite for large-scale training-data pipelines.

The reference only has exact dedup (``src/data_input/process_odr.py:1152-1164``
— pandas ``drop_duplicates`` on 9 columns); near-dedup is new target
functionality (SURVEY.md §2.7).  Five methods, each a Ray-Data-first
composition:

- **exact**: hash text → ``groupby(hash)`` → per-group first (min id).
  At 100 TB the shuffle moves 16-byte (hash, id) rows, never the text.
- **MinHash + LSH**: shingle → minhash → band keys → ``groupby(band)``
  emits candidate edges confirmed by signature-Jaccard → connected
  components → cluster table.
- **SimHash**: 64-bit fingerprint, banded by pigeonhole slices, candidate
  pairs confirmed by hamming distance.
- **n-gram Jaccard**: exact Jaccard over token n-gram hash sets for
  LSH candidates (confirm layer above the MinHash estimate).
- **embedding cosine**: near-dup pairs over an embedding column via
  blocked matmul against a broadcast (``ray.put``) normalized matrix.

Connected components run driver-side over the EDGE LIST only — edges are
O(near-dups), orders of magnitude smaller than the corpus; the heavy work
(shingling, hashing, banding, pair confirmation) is distributed.  At
10^12-doc scale the same edge stream feeds an iterative distributed CC
(hash-partitioned label propagation); the cluster-table contract is
unchanged.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..functions import fingerprint as fp
from .shuffle import arrow_refs, grouped_map


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

def add_text_hash(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Append a stable uint64 content hash (the shuffle key for exact dedup:
    16-byte rows move, not the text)."""
    h = fp.text_hash64(batch[text_col])
    return batch.append_column("text_hash", pa.array(h, pa.uint64()))


def exact_dedup(
    ds: "ray.data.Dataset", id_col: str, text_col: str = "text"
) -> "ray.data.Dataset":
    """One row per distinct text: (id_col = min id, n_dups = group size).

    Reference analog: ``drop_duplicates`` keep-first
    (``process_odr.py:1152-1164``), made deterministic under parallelism by
    taking the MINIMUM id rather than arrival-order first.
    """
    narrow = ds.map_batches(
        lambda b: add_text_hash(b, text_col).select(["text_hash", id_col]),
        batch_format="pyarrow",
    )
    return narrow.groupby("text_hash").aggregate(
        ray.data.aggregate.Min(id_col, alias_name=id_col),
        ray.data.aggregate.Count(alias_name="n_dups"),
    ).drop_columns(["text_hash"])


# ---------------------------------------------------------------------------
# Candidate-edge generation (shared by MinHash-LSH / SimHash / n-gram)
# ---------------------------------------------------------------------------

def _minhash_features(batch: pa.Table, id_col: str, text_col: str, n_bands: int) -> pa.Table:
    """Per-doc minhash signature + band keys, as fixed-size-list columns."""
    ids = batch[id_col].cast(pa.int64())
    mh = fp.minhash(batch[text_col])
    bands = fp.minhash_band_keys(mh, n_bands)
    return pa.table(
        {
            id_col: ids,
            "sig": pa.FixedSizeListArray.from_arrays(
                pa.array(mh.ravel(), pa.uint32()), mh.shape[1]
            ),
            "bands": pa.FixedSizeListArray.from_arrays(
                pa.array(bands.ravel(), pa.uint64()), n_bands
            ),
        }
    )


def _explode_bands(batch: pa.Table, id_col: str) -> pa.Table:
    """(doc, bands[list]) → one row per (band_no, band_key, doc, sig)."""
    n = batch.num_rows
    bands = batch["bands"]
    n_bands = bands.type.list_size
    take = np.repeat(np.arange(n, dtype=np.int64), n_bands)
    flat_keys = np.asarray(bands.combine_chunks().flatten(), dtype=np.uint64)
    band_no = np.tile(np.arange(n_bands, dtype=np.int64), n)
    out = batch.select([id_col, "sig"]).take(pa.array(take))
    out = out.append_column("band_no", pa.array(band_no, pa.int64()))
    out = out.append_column("band_key", pa.array(flat_keys, pa.uint64()))
    return out


_EMPTY_EDGES = pd.DataFrame(
    {"a": pd.Series([], dtype="int64"), "b": pd.Series([], dtype="int64")}
)


def _bucket_candidates(t: pa.Table, id_col: str, eq: list[np.ndarray] | None = None):
    """Shared sweep prologue: sort one hash partition by (band_no,
    band_key, eq..., id), find bucket boundaries, and emit ALL unique
    intra-bucket (row, row) candidate pairs for the confirm layer.

    LSH bucket semantics require every pair inside a bucket (an
    anchor-only star misses B-C whenever A-B and A-C fail the confirm —
    found by the simhash brute-force cross-check at sf0.1).  Hot-bucket
    safety comes from the optional ``eq`` full-hash arrays: rows whose
    full hashes are identical collapse into one group, contributing a
    (g-1)-edge chain instead of g(g-1)/2 pairs, and only group
    REPRESENTATIVES form cross pairs — exact for clustering because
    identical-hash members are interchangeable at the confirm.  Every
    emitted pair (chains included) still passes through the exact
    confirm, and pairs hit in several bands are confirmed once.
    Returns (sorted_table, anchor_idx, cand_idx)."""
    n = t.num_rows
    if n == 0:
        return None
    ids = t[id_col].to_numpy()
    bno = t["band_no"].to_numpy()
    bkey = t["band_key"].to_numpy()
    eqs = [np.asarray(e) for e in (eq or [])]
    order = np.lexsort((ids, *eqs[::-1], bkey, bno))
    t = t.take(pa.array(order))
    ids, bno, bkey = ids[order], bno[order], bkey[order]
    eqs = [e[order] for e in eqs]
    nb = np.ones(n, dtype=bool)
    nb[1:] = (bno[1:] != bno[:-1]) | (bkey[1:] != bkey[:-1])
    if eqs:
        ng = nb.copy()
        for e in eqs:
            ng[1:] |= e[1:] != e[:-1]
    else:
        # no full-hash columns -> no identical-group collapse: every row
        # is its own representative (plain all-pairs per bucket)
        ng = np.ones(n, dtype=bool)
    # identical-hash chains: consecutive rows of one group
    chain_c = np.flatnonzero(~ng)
    chain_a = chain_c - 1
    # segmented all-pairs across the group representatives of each bucket
    reps = np.flatnonzero(ng)
    first_rep = np.maximum.accumulate(
        np.where(nb[reps], np.arange(len(reps)), 0))
    cnt = np.arange(len(reps)) - first_rep
    tot = int(cnt.sum())
    if tot:
        seg = np.arange(tot) - np.repeat(np.cumsum(cnt) - cnt, cnt)
        anc_r = reps[np.repeat(first_rep, cnt) + seg]
        cand_r = np.repeat(reps, cnt)
        anc = np.concatenate([anc_r, chain_a])
        cand = np.concatenate([cand_r, chain_c])
    else:
        anc, cand = chain_a, chain_c
    if len(anc) == 0:
        return None
    # dedupe unordered id pairs across bands
    lo = np.minimum(ids[anc], ids[cand])
    hi = np.maximum(ids[anc], ids[cand])
    _, first = np.unique(np.stack([lo, hi], axis=1), axis=0, return_index=True)
    return t, anc[first], cand[first]


_DIGEST_W1 = np.uint64(0x9E3779B97F4A7C15)
_DIGEST_W2 = np.uint64(0xC2B2AE3D27D4EB4F)


def _sig_digests(sig: np.ndarray) -> list[np.ndarray]:
    """Two independent 64-bit mixes of a (n, k) signature matrix — the
    identical-group keys for hot-bucket collapse (collision ~2^-128,
    and a collision only risks a MISSED candidate, never a false edge,
    because every pair still passes the exact confirm)."""
    k = sig.shape[1]
    idx = np.arange(1, k + 1, dtype=np.uint64)
    s = sig.astype(np.uint64)
    d1 = (s * (_DIGEST_W1 * idx)).sum(axis=1, dtype=np.uint64)
    d2 = (s * (_DIGEST_W2 * idx + np.uint64(1))).sum(axis=1, dtype=np.uint64)
    return [d1, d2]


def _minhash_edge_sweep(t: pa.Table, id_col: str, threshold: float) -> pd.DataFrame:
    """Vectorized confirm across ALL buckets of a partition: one
    fancy-indexed signature comparison instead of a per-bucket UDF."""
    k = t["sig"].type.list_size
    presig = np.asarray(t["sig"].combine_chunks().flatten()).reshape(-1, k)
    pre = _bucket_candidates(t, id_col, eq=_sig_digests(presig))
    if pre is None:
        return _EMPTY_EDGES
    t, anc, cand = pre
    ids = t[id_col].to_numpy()
    sig = np.asarray(t["sig"].combine_chunks().flatten()).reshape(-1, k)
    sim = (sig[anc] == sig[cand]).mean(axis=1)
    hit = sim >= threshold
    a = np.minimum(ids[anc][hit], ids[cand][hit])
    b = np.maximum(ids[anc][hit], ids[cand][hit])
    return pd.DataFrame({"a": a.astype(np.int64), "b": b.astype(np.int64)})


def minhash_lsh_edges(
    ds: "ray.data.Dataset",
    id_col: str,
    text_col: str = "text",
    n_bands: int = 16,
    threshold: float = 0.8,
) -> "ray.data.Dataset":
    """Confirmed near-dup candidate edges via MinHash-LSH banding.

    shingle→minhash→band (map_batches) → explode band keys → groupby(band)
    → per-bucket confirm.  The groupby shuffle moves only (id, sig, key).
    """
    feats = ds.map_batches(
        _minhash_features,
        fn_kwargs={"id_col": id_col, "text_col": text_col, "n_bands": n_bands},
        batch_format="pyarrow",
    )
    exploded = feats.map_batches(
        _explode_bands, fn_kwargs={"id_col": id_col}, batch_format="pyarrow"
    )
    return grouped_map(
        exploded, ["band_no", "band_key"], _minhash_edge_sweep,
        fn_kwargs={"id_col": id_col, "threshold": threshold},
    )


def _simhash_features(batch: pa.Table, id_col: str, text_col: str) -> pa.Table:
    sh = fp.simhash(batch[text_col])
    return pa.table(
        {
            id_col: batch[id_col].cast(pa.int64()),
            "simhash": pa.array(sh, pa.uint64()),
        }
    )


def _simhash_explode(batch: pa.Table, id_col: str, n_bands: int) -> pa.Table:
    sh = batch["simhash"].to_numpy()
    bands = fp.simhash_bands(sh, n_bands)
    n = len(sh)
    take = np.repeat(np.arange(n, dtype=np.int64), n_bands)
    out = batch.take(pa.array(take))
    out = out.append_column("band_no", pa.array(np.tile(np.arange(n_bands, dtype=np.int64), n)))
    out = out.append_column("band_key", pa.array(bands.ravel(), pa.uint64()))
    return out


def _simhash_edge_sweep(t: pa.Table, id_col: str, max_hamming: int) -> pd.DataFrame:
    pre = _bucket_candidates(t, id_col,
                             eq=[t["simhash"].to_numpy().astype(np.uint64)])
    if pre is None:
        return _EMPTY_EDGES
    t, anc, cand = pre
    ids = t[id_col].to_numpy()
    sh = t["simhash"].to_numpy().astype(np.uint64)
    d = fp.hamming64(sh[anc], sh[cand])
    hit = d <= max_hamming
    a = np.minimum(ids[anc][hit], ids[cand][hit])
    b = np.maximum(ids[anc][hit], ids[cand][hit])
    return pd.DataFrame({"a": a.astype(np.int64), "b": b.astype(np.int64)})


def simhash_edges(
    ds: "ray.data.Dataset",
    id_col: str,
    text_col: str = "text",
    n_bands: int = 4,
    max_hamming: int = 3,
) -> "ray.data.Dataset":
    """Near-dup edges via SimHash banding (pigeonhole: hamming < n_bands
    guarantees a shared band) confirmed by exact hamming distance."""
    feats = ds.map_batches(
        _simhash_features, fn_kwargs={"id_col": id_col, "text_col": text_col},
        batch_format="pyarrow",
    )
    exploded = feats.map_batches(
        _simhash_explode, fn_kwargs={"id_col": id_col, "n_bands": n_bands},
        batch_format="pyarrow",
    )
    return grouped_map(
        exploded, ["band_no", "band_key"], _simhash_edge_sweep,
        fn_kwargs={"id_col": id_col, "max_hamming": max_hamming},
    )


def _ngram_features(batch: pa.Table, id_col: str, text_col: str, n: int) -> pa.Table:
    from ..functions.textstats import ngram_set_hashes

    hashes, counts = ngram_set_hashes(batch[text_col], n=n)
    offsets = np.concatenate(([0], np.cumsum(counts))).astype(np.int32)
    return pa.table(
        {
            id_col: batch[id_col].cast(pa.int64()),
            "ngrams": pa.ListArray.from_arrays(
                pa.array(offsets), pa.array(hashes, pa.uint64())
            ),
        }
    )


def _gather_pair_side(offs: np.ndarray, vals: np.ndarray, rows: np.ndarray
                      ) -> tuple[np.ndarray, np.ndarray]:
    """(pair_idx, gram) rows for one side of every candidate pair:
    pair p's side takes vals[offs[rows[p]]:offs[rows[p]+1]] — a fully
    vectorized ragged gather."""
    lens = (offs[rows + 1] - offs[rows]).astype(np.int64)
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, np.int64), np.empty(0, vals.dtype)
    seg_start = np.cumsum(lens) - lens
    within = np.arange(total, dtype=np.int64) - np.repeat(seg_start, lens)
    flat_idx = np.repeat(offs[rows].astype(np.int64), lens) + within
    return np.repeat(np.arange(len(rows), dtype=np.int64), lens), vals[flat_idx]


def _set_jaccard_many(ia: np.ndarray, va: np.ndarray,
                      ib: np.ndarray, vb: np.ndarray, n_pairs: int) -> np.ndarray:
    """Exact SET Jaccard per pair, vectorized: dedupe each side per pair,
    count (pair, gram) values present on BOTH sides via one sort, then
    |A∩B| / |A∪B| (empty∪empty → 1.0, matching the scalar set version)."""
    def _uniq(idx, vals):
        if len(idx) == 0:
            return idx, vals
        o = np.lexsort((vals, idx))
        i2, v2 = idx[o], vals[o]
        keep = np.ones(len(v2), dtype=bool)
        keep[1:] = (i2[1:] != i2[:-1]) | (v2[1:] != v2[:-1])
        return i2[keep], v2[keep]

    ia, va = _uniq(ia, va)
    ib, vb = _uniq(ib, vb)
    na = np.bincount(ia, minlength=n_pairs)
    nb = np.bincount(ib, minlength=n_pairs)
    pi = np.concatenate([ia, ib])
    pv = np.concatenate([va, vb])
    if len(pi):
        o = np.lexsort((pv, pi))
        pi, pv = pi[o], pv[o]
        match = (pi[1:] == pi[:-1]) & (pv[1:] == pv[:-1])
        inter = np.bincount(pi[1:][match], minlength=n_pairs)
    else:
        inter = np.zeros(n_pairs, dtype=np.int64)
    union = na + nb - inter
    return np.where(union > 0, inter / np.maximum(union, 1), 1.0)


def _ngram_edge_sweep(t: pa.Table, id_col: str, threshold: float) -> pd.DataFrame:
    """Exact n-gram-set Jaccard confirm, anchor-based — vectorized over
    every candidate pair of the partition (one ragged gather per side +
    one sort; no per-pair Python)."""
    pre = _bucket_candidates(t, id_col)
    if pre is None:
        return _EMPTY_EDGES
    t, anc, cand = pre
    ids = t[id_col].to_numpy()
    grams = t["ngrams"].combine_chunks()
    offs = grams.offsets.to_numpy().astype(np.int64)
    vals = grams.values.to_numpy()
    ia, va = _gather_pair_side(offs, vals, anc)
    ib, vb = _gather_pair_side(offs, vals, cand)
    jac = _set_jaccard_many(ia, va, ib, vb, len(anc))
    hit = jac >= threshold
    a = np.minimum(ids[anc][hit], ids[cand][hit])
    b = np.maximum(ids[anc][hit], ids[cand][hit])
    return pd.DataFrame({"a": a.astype(np.int64), "b": b.astype(np.int64)})


def _band_pairs_sweep(t: pa.Table, id_col: str) -> pd.DataFrame:
    """Candidate (anchor, candidate) id pairs from all LSH buckets of one
    partition — ids only (the heavy gram sets are joined on afterwards)."""
    pre = _bucket_candidates(t, id_col)
    if pre is None:
        return _EMPTY_EDGES
    t, anc, cand = pre
    ids = t[id_col].to_numpy()
    return pd.DataFrame({"a": ids[anc].astype(np.int64), "b": ids[cand].astype(np.int64)})


def _dedupe_pairs_sweep(t: pa.Table) -> pd.DataFrame:
    return t.to_pandas().drop_duplicates(["a", "b"])


_GRAM_LIST = pa.list_(pa.uint64())


def _list_column(values: list[list[int] | None]) -> pa.Array:
    return pa.array(values, type=_GRAM_LIST)


def _attach_grams_sweep(t: pa.Table, key: str, out_col: str) -> pa.Table:
    """Co-partitioned hash join of candidate pairs with gram sets on one
    endpoint: gram rows (pair partner == -1) carry the list for ``key``;
    pair rows pick it up.  Gram payloads travel as explicit Arrow list
    columns (never pandas object columns — Ray would coerce those to its
    ragged-tensor extension, which can't round-trip through take)."""
    is_gram = np.asarray(t["_gram"])
    gram_t = t.filter(pa.array(is_gram))
    pair_t = t.filter(pa.array(~is_gram))
    # vectorized probe: int64 hash-index on the gram keys + Arrow take on
    # the list column — no per-key Python dict and no list materialization
    gram_keys = gram_t[key].to_numpy()
    index = pd.Index(gram_keys)
    if index.has_duplicates:  # defensive: dict semantics kept last row
        keep_last = ~index.duplicated(keep="last")
        gram_t = gram_t.filter(pa.array(keep_last))
        index = pd.Index(gram_keys[keep_last])
    idx = index.get_indexer(pair_t[key].to_numpy())
    hit = idx >= 0
    pair_t = pair_t.filter(pa.array(hit))
    attached = gram_t["ngrams"].combine_chunks().take(
        pa.array(idx[hit], pa.int64())
    )
    keep_cols = [c for c in pair_t.column_names if c not in ("_gram", "ngrams", out_col)]
    out = pair_t.select(keep_cols)
    return out.append_column(out_col, attached.cast(_GRAM_LIST))


def _ngram_all_features(batch: pa.Table, id_col: str, text_col: str,
                        n_bands: int, n: int) -> pa.Table:
    """ONE tokenize pass per doc → LSH band keys (for candidate proposal)
    AND the exact n-gram hash set (for the confirm).  Tokenization is the
    dominant cost of both feature extractors; computing them together and
    materializing once halves the corpus passes of ngram_jaccard_edges."""
    ids = batch[id_col].cast(pa.int64())
    tok_h, n_per_doc = fp._tokenize(batch[text_col])
    sh_mh, cnt_mh = fp._shingle_hashes(tok_h, n_per_doc)
    mh = fp._minhash_from_shingles(sh_mh, cnt_mh, fp.MINHASH_K)
    bands = fp.minhash_band_keys(mh, n_bands)
    if n == fp.SHINGLE_W:
        grams, cnt_g = sh_mh, cnt_mh
    else:
        grams, cnt_g = fp._shingle_hashes(tok_h, n_per_doc, w=n)
    offsets = np.concatenate(([0], np.cumsum(cnt_g))).astype(np.int32)
    return pa.table(
        {
            id_col: ids,
            "bands": pa.FixedSizeListArray.from_arrays(
                pa.array(bands.ravel(), pa.uint64()), n_bands
            ),
            "ngrams": pa.ListArray.from_arrays(
                pa.array(offsets), pa.array(grams, pa.uint64())
            ),
        }
    )


def _explode_band_keys(batch: pa.Table, id_col: str) -> pa.Table:
    """(doc, bands[list]) → one (id, band_no, band_key) row per band —
    WITHOUT the minhash signature (the n-gram confirm never reads it, so
    the band shuffle ships ~32-byte rows instead of ~290)."""
    n = batch.num_rows
    bands = batch["bands"]
    n_bands = bands.type.list_size
    ids = batch[id_col].to_numpy()
    return pa.table(
        {
            id_col: pa.array(np.repeat(ids, n_bands), pa.int64()),
            "band_no": pa.array(np.tile(np.arange(n_bands, dtype=np.int64), n)),
            "band_key": pa.array(
                np.asarray(bands.combine_chunks().flatten(), dtype=np.uint64),
                pa.uint64(),
            ),
        }
    )


def ngram_jaccard_edges(
    ds: "ray.data.Dataset",
    id_col: str,
    text_col: str = "text",
    n: int = 3,
    n_bands: int = 16,
    threshold: float = 0.7,
) -> "ray.data.Dataset":
    """EXACT n-gram Jaccard dedup: MinHash-LSH proposes candidate pairs,
    the exact n-gram-set Jaccard confirms — no estimation error in the
    final edges.

    Scale shape (no broadcast of the gram corpus): band sweep emits
    candidate (a, b) ID pairs; grams join onto the pairs via TWO
    co-partitioned hash joins (by a, then by b) so each doc's gram set is
    shipped only to partitions holding its candidate pairs; the confirm
    runs vectorized over the joined pairs.  Duplicate edges across
    partitions collapse in the cluster stage.

    The per-doc features (band keys + gram set) are computed in ONE
    tokenize pass and materialized to object-store refs, then re-read by
    the band explode and both gram-join sides — recomputing the corpus
    features per consumer (3×) costs far more than letting plasma hold
    (and at scale, spill) the narrow feature table.
    """
    feat_refs = arrow_refs(ds.map_batches(
        _ngram_all_features,
        fn_kwargs={"id_col": id_col, "text_col": text_col,
                   "n_bands": n_bands, "n": n},
        batch_format="pyarrow",
    ))

    def _feats() -> "ray.data.Dataset":
        return ray.data.from_arrow_refs(list(feat_refs))

    exploded = _feats().map_batches(
        _explode_band_keys, fn_kwargs={"id_col": id_col}, batch_format="pyarrow"
    )
    pairs = grouped_map(
        exploded, ["band_no", "band_key"], _band_pairs_sweep,
        fn_kwargs={"id_col": id_col},
    )
    # a pair proposed by several bands lands in several partitions —
    # dedupe once (cheap: id pairs only) before shipping gram sets
    pairs = grouped_map(pairs, ["a", "b"], _dedupe_pairs_sweep)

    def _gram_rows(batch: pa.Table, key: str) -> pa.Table:
        other = "b" if key == "a" else "a"
        n = batch.num_rows
        return pa.table({
            key: batch[id_col].combine_chunks().cast(pa.int64()),
            other: pa.array(np.full(n, -1, dtype=np.int64), pa.int64()),
            "ngrams": batch["ngrams"].combine_chunks().cast(_GRAM_LIST),
            "_gram": pa.array(np.ones(n, dtype=bool)),
        })

    def _pair_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            "a": batch["a"].combine_chunks().cast(pa.int64()),
            "b": batch["b"].combine_chunks().cast(pa.int64()),
            "ngrams": pa.nulls(n, _GRAM_LIST),
            "_gram": pa.array(np.zeros(n, dtype=bool)),
        })

    # join grams onto pairs by a, then by b (both co-partitioned)
    ga = _feats().map_batches(_gram_rows, fn_kwargs={"key": "a"}, batch_format="pyarrow")
    j1 = grouped_map(
        pairs.map_batches(_pair_rows, batch_format="pyarrow").union(ga),
        ["a"], _attach_grams_sweep, fn_kwargs={"key": "a", "out_col": "grams_a"},
    )

    J2_COLS = ["a", "b", "grams_a", "ngrams", "_gram"]

    def _tag_j1(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        batch = batch.append_column("ngrams", pa.nulls(n, _GRAM_LIST))
        return batch.append_column("_gram", pa.array(np.zeros(n, dtype=bool))).select(J2_COLS)

    gb = _feats().map_batches(_gram_rows, fn_kwargs={"key": "b"}, batch_format="pyarrow")

    def _gb_pad(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "grams_a", pa.nulls(batch.num_rows, _GRAM_LIST)
        ).select(J2_COLS)

    j2 = grouped_map(
        j1.map_batches(_tag_j1, batch_format="pyarrow").union(
            gb.map_batches(_gb_pad, batch_format="pyarrow")
        ),
        ["b"], _attach_grams_sweep, fn_kwargs={"key": "b", "out_col": "ngrams"},
    )

    def confirm(batch: pa.Table) -> pd.DataFrame:
        n = batch.num_rows
        if n == 0:
            return _EMPTY_EDGES
        a_ids = batch["a"].to_numpy()
        b_ids = batch["b"].to_numpy()
        ga = batch["grams_a"].combine_chunks()
        gb = batch["ngrams"].combine_chunks()
        rows = np.arange(n, dtype=np.int64)
        ia, va = _gather_pair_side(ga.offsets.to_numpy().astype(np.int64),
                                   ga.values.to_numpy(), rows)
        ib, vb = _gather_pair_side(gb.offsets.to_numpy().astype(np.int64),
                                   gb.values.to_numpy(), rows)
        jac = _set_jaccard_many(ia, va, ib, vb, n)
        hit = jac >= threshold
        return pd.DataFrame({
            "a": np.minimum(a_ids[hit], b_ids[hit]).astype(np.int64),
            "b": np.maximum(a_ids[hit], b_ids[hit]).astype(np.int64),
        })

    return j2.map_batches(confirm, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Connected components → cluster table
# ---------------------------------------------------------------------------

def edges_to_clusters(edges_df: pd.DataFrame) -> pd.DataFrame:
    """Union-find over the (small) edge list → (id, cluster_id, cluster_size)
    for members of clusters of size >= 2. cluster_id = min member id."""
    if len(edges_df) == 0:
        return pd.DataFrame(
            {"member_id": pd.Series([], dtype="int64"),
             "cluster_id": pd.Series([], dtype="int64"),
             "cluster_size": pd.Series([], dtype="int64")}
        )
    nodes = pd.unique(pd.concat([edges_df["a"], edges_df["b"]], ignore_index=True))
    idx = {int(v): i for i, v in enumerate(nodes)}
    parent = list(range(len(nodes)))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(edges_df["a"].to_numpy(), edges_df["b"].to_numpy()):
        ra, rb = find(idx[int(a)]), find(idx[int(b)])
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    roots = np.array([find(i) for i in range(len(nodes))])
    df = pd.DataFrame({"member_id": nodes.astype(np.int64), "_root": roots})
    gb = df.groupby("_root")
    df["cluster_id"] = gb["member_id"].transform("min").astype(np.int64)
    df["cluster_size"] = gb["member_id"].transform("size").astype(np.int64)
    return (
        df[df["cluster_size"] >= 2][["member_id", "cluster_id", "cluster_size"]]
        .sort_values(["cluster_id", "member_id"], kind="stable")
        .reset_index(drop=True)
    )


def cluster_table(edges_ds: "ray.data.Dataset") -> pd.DataFrame:
    """Collect the edge stream (small: O(near-dups)) and label clusters."""
    parts = ray.get(arrow_refs(edges_ds))
    tbl = pa.concat_tables(parts, promote_options="default") if parts else None
    if tbl is None or tbl.num_rows == 0:
        return edges_to_clusters(pd.DataFrame({"a": [], "b": []}))
    df = tbl.to_pandas().drop_duplicates(["a", "b"])
    return edges_to_clusters(df)


# -- distributed connected components (the 10^12-doc scale path) ------------

def _cc_local_min(t: pa.Table) -> pd.DataFrame:
    """One partition's rows: (node, cand_label) -> min label per node."""
    df = t.to_pandas()
    return df.groupby("node", sort=False)["label"].min().reset_index()


def _cc_propagate(t: pa.Table) -> pd.DataFrame:
    """One partition (co-located by node hash) holding label rows AND edge
    endpoint rows for its nodes: join labels onto edges and emit the
    label to the OTHER endpoint (plus keep own labels)."""
    df = t.to_pandas()
    labels = df[df["peer"] < 0][["node", "label"]]
    edges = df[df["peer"] >= 0]
    lab = labels.set_index("node")["label"]
    out = [labels]
    if len(edges):
        lam = edges["node"].map(lab)
        ok = lam.notna()
        out.append(pd.DataFrame({
            "node": edges.loc[ok, "peer"].to_numpy(np.int64),
            "label": lam[ok].to_numpy(np.int64),
        }))
    return pd.concat(out, ignore_index=True)


def _cc_symmetrize(batch: pa.Table) -> pa.Table:
    a = batch["a"].to_numpy().astype(np.int64)
    b = batch["b"].to_numpy().astype(np.int64)
    return pa.table({
        "node": pa.array(np.concatenate([a, b]), pa.int64()),
        "peer": pa.array(np.concatenate([b, a]), pa.int64()),
    })


@ray.remote
def _cc_nrows(t: pa.Table) -> int:
    return t.num_rows


@ray.remote
def _cc_init_labels(t: pa.Table) -> pa.Table:
    """Initial label candidates per node: its own id and each neighbor."""
    node = t["node"].to_numpy()
    peer = t["peer"].to_numpy()
    return pa.table({
        "node": pa.array(np.concatenate([node, node]), pa.int64()),
        "label": pa.array(np.concatenate([node, peer]), pa.int64()),
    })


@ray.remote
def _cc_tag_labels(t: pa.Table) -> pa.Table:
    return pa.table({
        "node": t["node"].combine_chunks().cast(pa.int64()),
        "peer": pa.array(np.full(t.num_rows, -1, dtype=np.int64), pa.int64()),
        "label": t["label"].combine_chunks().cast(pa.int64()),
    })


@ray.remote
def _cc_tag_edges(t: pa.Table) -> pa.Table:
    return pa.table({
        "node": t["node"].combine_chunks().cast(pa.int64()),
        "peer": t["peer"].combine_chunks().cast(pa.int64()),
        "label": pa.array(np.zeros(t.num_rows, dtype=np.int64), pa.int64()),
    })


@ray.remote
def _cc_label_sum(t: pa.Table) -> int:
    return int(np.sum(t["label"].to_numpy()))


def distributed_components(
    edges_ds: "ray.data.Dataset", max_iters: int = 50,
    n_partitions: int | None = None,
) -> pd.DataFrame:
    """Connected components by hash-partitioned min-label propagation —
    the scale path for edge lists too large for driver-side union-find
    (``edges_to_clusters``).  Per iteration: co-partition label rows and
    symmetrized edge endpoints by node hash, join locally, send each
    node's current label across its edges, then take the per-node min.
    Iterations ≈ cluster diameter (near-dup clusters are tiny).  Output
    contract identical to ``edges_to_clusters``.

    The loop runs entirely on plasma refs (``grouped_map`` list-in /
    refs-out) with partition count sized to the edge volume — per-step
    Dataset executor spin-up would otherwise dominate the tiny-cluster
    case while changing nothing at scale.
    """
    sym_refs = arrow_refs(edges_ds.map_batches(
        _cc_symmetrize, batch_format="pyarrow"
    ))
    n_half_edges = int(sum(ray.get([_cc_nrows.remote(r) for r in sym_refs])))
    if n_partitions is None:
        # size the exchange to the edge volume: a tiny edge list on 32
        # fixed partitions pays 32 tasks/stage of pure overhead
        n_partitions = int(max(4, min(32, n_half_edges // 20_000 + 4)))

    # everything below runs on plasma refs (grouped_map list-in/refs-out):
    # each iteration is two hash exchanges and a driver checksum, with no
    # per-step Dataset executor spin-up
    label_refs = grouped_map(
        [_cc_init_labels.remote(r) for r in sym_refs],
        ["node"], _cc_local_min, n_partitions=n_partitions, return_refs=True,
    )
    edge_tagged = [_cc_tag_edges.remote(r) for r in sym_refs]

    prev_sum = None
    for _ in range(max_iters):
        tagged = [_cc_tag_labels.remote(r) for r in label_refs] + edge_tagged
        cand = grouped_map(tagged, ["node"], _cc_propagate,
                           n_partitions=n_partitions, return_refs=True)
        label_refs = grouped_map(cand, ["node"], _cc_local_min,
                                 n_partitions=n_partitions, return_refs=True)
        chk = int(sum(ray.get([_cc_label_sum.remote(r) for r in label_refs])))
        if chk == prev_sum:  # labels are monotonically non-increasing mins
            break
        prev_sum = chk

    tabs = [t for t in ray.get(label_refs) if t is not None and t.num_rows]
    mem = (
        pa.concat_tables(tabs, promote_options="default").to_pandas()
        if tabs else pd.DataFrame({"node": [], "label": []})
    ).rename(columns={"node": "member_id", "label": "cluster_id"})
    sizes = mem.groupby("cluster_id")["member_id"].transform("size").astype(np.int64)
    mem["cluster_size"] = sizes
    return (
        mem[mem["cluster_size"] >= 2]
        .sort_values(["cluster_id", "member_id"], kind="stable")
        .reset_index(drop=True)[["member_id", "cluster_id", "cluster_size"]]
    )


def distributed_vs_driver_mismatch(edges_ds: "ray.data.Dataset") -> pd.DataFrame:
    """Run BOTH connected-components paths on the SAME materialized edge
    list — distributed min-label propagation and driver union-find — and
    return the count of member rows on which they disagree (expected 0).

    The invariant itself (two independent CC algorithms agree row-exactly)
    is not SQL-expressible, so the query's oracle pins the expected
    violation count instead; this gives the correctness driver a checkable
    value for the distributed path rather than a bare row count."""
    refs = arrow_refs(edges_ds)
    dist = distributed_components(ray.data.from_arrow_refs(list(refs)))
    drv = cluster_table(ray.data.from_arrow_refs(list(refs)))
    merged = dist.merge(drv, on="member_id", how="outer",
                        suffixes=("_dist", "_drv"), indicator=True)
    both = merged["_merge"] == "both"
    diff = (
        (merged.loc[both, "cluster_id_dist"] != merged.loc[both, "cluster_id_drv"])
        | (merged.loc[both, "cluster_size_dist"] != merged.loc[both, "cluster_size_drv"])
    ).sum()
    mismatch = int((~both).sum() + diff)
    return pd.DataFrame({"mismatch_rows": pd.Series([mismatch], dtype="int64")})


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup
# ---------------------------------------------------------------------------

_RHP_SEED = 0xC051  # fixed seed for hyperplanes
_RHP_BITS = 64


def _rhp_signature(mat_n: np.ndarray) -> np.ndarray:
    """64-bit random-hyperplane signature per (normalized) vector —
    P[bit agrees] = 1 − θ/π, so high-cosine pairs collide in bit bands.
    Planes derive deterministically from (seed, dim): every worker
    computes identical planes with no broadcast."""
    dim = mat_n.shape[1]
    planes = np.random.RandomState(_RHP_SEED + dim).randn(_RHP_BITS, dim)
    bits = (mat_n @ planes.T) > 0  # (n, 64)
    return np.packbits(bits.astype(np.uint8), axis=1, bitorder="little").view(np.uint64).ravel()


def _embed_lsh_sweep(t: pa.Table, threshold: float) -> pd.DataFrame:
    """All within-bucket pairs confirmed by exact cosine (vectors are
    co-located in the partition); bucket sizes are small by construction."""
    n = t.num_rows
    if n == 0:
        return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                             "id_b": pd.Series([], dtype="int64"),
                             "cos_sim_micros": pd.Series([], dtype="int64")})
    ids = t["id"].to_numpy()
    bno = t["band_no"].to_numpy()
    bkey = t["band_key"].to_numpy()
    vecs = t["vec"].combine_chunks()
    dim = vecs.type.list_size
    mat = np.asarray(vecs.flatten()).reshape(n, dim)
    order = np.lexsort((ids, bkey, bno))
    ids, bno, bkey, mat = ids[order], bno[order], bkey[order], mat[order]
    nb = np.ones(n, dtype=bool)
    nb[1:] = (bno[1:] != bno[:-1]) | (bkey[1:] != bkey[:-1])
    starts = np.flatnonzero(nb)
    ends = np.append(starts[1:], n)
    out_a, out_b, out_s = [], [], []
    thr = int(threshold * 1e6)
    for s, e in zip(starts, ends):
        if e - s < 2:
            continue
        sub = mat[s:e]
        sims = sub @ sub.T
        micros = np.floor(sims * 1e6 + 0.5).astype(np.int64)
        iu, ju = np.triu_indices(e - s, k=1)
        hit = micros[iu, ju] >= thr
        ia, ib = ids[s:e][iu[hit]], ids[s:e][ju[hit]]
        out_a.append(np.minimum(ia, ib))
        out_b.append(np.maximum(ia, ib))
        out_s.append(micros[iu, ju][hit])
    if not out_a:
        return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                             "id_b": pd.Series([], dtype="int64"),
                             "cos_sim_micros": pd.Series([], dtype="int64")})
    df = pd.DataFrame({
        "id_a": np.concatenate(out_a).astype(np.int64),
        "id_b": np.concatenate(out_b).astype(np.int64),
        "cos_sim_micros": np.concatenate(out_s).astype(np.int64),
    })
    return df.drop_duplicates(["id_a", "id_b"])


def embedding_cosine_pairs_lsh(
    ds: "ray.data.Dataset",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    n_bands: int = 8,
) -> "ray.data.Dataset":
    """Scale path for embedding near-dup pairs: random-hyperplane LSH
    banding instead of broadcasting the full matrix
    (``embedding_cosine_pairs``).  Recall is high for near-dup thresholds
    (≥0.9: a 0.9-cosine pair agrees per bit w.p. ~0.86 → ≥1 shared 8-bit
    band w.p. ~0.97) and drops for loose thresholds — use the brute-force
    path there.  Residual duplicate edges across band partitions are
    deduped in-sweep and by the cluster/consumer stage.
    """
    width = _RHP_BITS // n_bands
    mask = np.uint64((1 << width) - 1)

    def features(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        mat = np.stack(batch[vec_col].to_pandas().to_numpy()).astype(np.float64)
        nn = np.linalg.norm(mat, axis=1, keepdims=True)
        nn[nn == 0] = 1.0
        mat_n = mat / nn
        sig = _rhp_signature(mat_n)
        rows = np.repeat(np.arange(n), n_bands)
        band_no = np.tile(np.arange(n_bands, dtype=np.int64), n)
        band_key = (sig[rows] >> (band_no.astype(np.uint64) * np.uint64(width))) & mask
        return pa.table({
            "id": pa.array(batch[id_col].to_numpy().astype(np.int64)[rows], pa.int64()),
            "band_no": pa.array(band_no, pa.int64()),
            "band_key": pa.array(band_key, pa.uint64()),
            "vec": pa.FixedSizeListArray.from_arrays(
                pa.array(mat_n[rows].ravel(), pa.float64()), mat_n.shape[1]
            ),
        })

    exploded = ds.map_batches(features, batch_format="pyarrow")
    pairs = grouped_map(exploded, ["band_no", "band_key"], _embed_lsh_sweep,
                        fn_kwargs={"threshold": threshold})
    # cross-partition dedupe (same pair can surface from several bands)
    return grouped_map(pairs, ["id_a", "id_b"],
                       _dedupe_pairs_lsh_sweep)


def _dedupe_pairs_lsh_sweep(t: pa.Table) -> pd.DataFrame:
    return t.to_pandas().drop_duplicates(["id_a", "id_b"])

def embedding_cosine_pairs(
    ds: "ray.data.Dataset",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> "ray.data.Dataset":
    """All pairs (a < b) with cosine similarity >= threshold.

    Build side = the full normalized matrix broadcast once with ``ray.put``
    (fine while n_vectors × dim fits one node — the IVF variant in
    ``stages/similarity.py`` is the scale path); probe side streams in
    map_batches with one matmul per batch.
    """
    full = pa.concat_tables(ray.get(arrow_refs(ds)), promote_options="default")
    ids_all = full[id_col].to_numpy().astype(np.int64)
    mat = np.stack(full[vec_col].to_pandas().to_numpy()).astype(np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    mat_n = mat / norms
    order = np.argsort(ids_all, kind="stable")
    ids_all, mat_n = ids_all[order], mat_n[order]
    build_ref = ray.put((ids_all, mat_n))

    def probe(batch: pa.Table) -> pa.Table:
        b_ids = batch[id_col].to_numpy().astype(np.int64)
        b_mat = np.stack(batch[vec_col].to_pandas().to_numpy()).astype(np.float64)
        n = np.linalg.norm(b_mat, axis=1, keepdims=True)
        n[n == 0] = 1.0
        b_n = b_mat / n
        a_ids, a_mat = ray.get(build_ref)
        sims = b_n @ a_mat.T  # (batch, all)
        # threshold on the micros-scaled int so engine and SQL oracle agree
        # bit-for-bit at the boundary (floor(x*1e6+0.5), half-away rounding)
        micros = np.floor(sims * 1e6 + 0.5).astype(np.int64)
        bi, ai = np.nonzero(micros >= int(threshold * 1e6))
        keep = b_ids[bi] < a_ids[ai]  # dedupe symmetric + self pairs
        return pa.table(
            {
                "id_a": pa.array(b_ids[bi][keep], pa.int64()),
                "id_b": pa.array(a_ids[ai][keep], pa.int64()),
                "cos_sim_micros": pa.array(micros[bi, ai][keep], pa.int64()),
            }
        )

    return ds.map_batches(probe, batch_format="pyarrow")


# -- single-process cross-checks (driver-visible invariants) ----------------

def _ref_label_propagation(edges: np.ndarray, nodes: np.ndarray) -> pd.DataFrame:
    """Independent clustering for the cross-checks: dense iterative
    min-label propagation to a fixpoint (deliberately NOT the union-find
    that cluster_table uses, so the two paths share no clustering code)."""
    order = np.argsort(nodes)
    nodes = nodes[order]
    label = nodes.copy()
    if edges.size:
        a = np.searchsorted(nodes, edges[:, 0])
        b = np.searchsorted(nodes, edges[:, 1])
        while True:
            prev = label.copy()
            m = np.minimum(label[a], label[b])
            np.minimum.at(label, a, m)
            np.minimum.at(label, b, m)
            # chase one hop: point every node at its label's label
            label = label[np.searchsorted(nodes, label)]
            if np.array_equal(label, prev):
                break
    df = pd.DataFrame({"member_id": nodes, "cluster_id": label})
    df["cluster_size"] = df.groupby("cluster_id")["member_id"].transform("size")
    return (df[df["cluster_size"] >= 2].astype(np.int64)
            .sort_values(["cluster_id", "member_id"], kind="stable")
            .reset_index(drop=True))


def minhash_reference_clusters(ids: np.ndarray, texts: pa.ChunkedArray | pa.Array,
                               n_bands: int = 16, threshold: float = 0.8) -> pd.DataFrame:
    """Single-process minhash-LSH clusters: whole-corpus signatures, per-band
    bucket all-pairs, signature-Jaccard confirm, label propagation.  Shares
    only the base hash kernels with the distributed path — the banding
    explode / bucket shuffle / pair sweeps / CC are all recomputed
    differently.  Check-query scale only (corpus collected to the driver)."""
    sig = fp.minhash(texts)
    bands = fp.minhash_band_keys(sig, n_bands)
    edges = set()
    for j in range(n_bands):
        dfb = pd.DataFrame({"id": ids, "k": bands[:, j]})
        for _, grp in dfb.groupby("k", sort=False):
            g = np.sort(grp["id"].to_numpy())
            if len(g) < 2:
                continue
            ii, jj = np.triu_indices(len(g), k=1)
            edges.update(zip(g[ii].tolist(), g[jj].tolist()))
    if edges:
        e = np.array(sorted(edges), dtype=np.int64)
        pos = {int(v): i for i, v in enumerate(ids)}
        sa = sig[[pos[int(x)] for x in e[:, 0]]]
        sb = sig[[pos[int(x)] for x in e[:, 1]]]
        e = e[fp.jaccard_from_minhash(sa, sb) >= threshold]
    else:
        e = np.empty((0, 2), dtype=np.int64)
    return _ref_label_propagation(e, np.asarray(ids, dtype=np.int64))


def simhash_reference_clusters(ids: np.ndarray, texts: pa.ChunkedArray | pa.Array,
                               max_hamming: int = 3) -> pd.DataFrame:
    """Single-process simhash clusters via brute-force ALL-pairs hamming —
    stronger than the banded engine path (verifies the pigeonhole banding
    missed no pair).  Check-query scale only (O(n^2) pairs)."""
    sh = fp.simhash(texts)
    n = len(sh)
    lut = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None],
                        axis=1).sum(axis=1).astype(np.uint8)
    pairs_a, pairs_b = [], []
    for lo in range(0, n, 512):           # row-chunked: bounds peak memory
        hi = min(lo + 512, n)
        x = sh[lo:hi, None] ^ sh[None, :]
        pop = lut[x.view(np.uint8).reshape(hi - lo, n, 8)].sum(axis=2)
        ii, jj = np.nonzero(pop <= max_hamming)
        keep = (ii + lo) < jj              # upper triangle only
        pairs_a.append(ids[ii[keep] + lo])
        pairs_b.append(ids[jj[keep]])
    a = np.concatenate(pairs_a) if pairs_a else np.empty(0, np.int64)
    b = np.concatenate(pairs_b) if pairs_b else np.empty(0, np.int64)
    e = np.stack([np.minimum(a, b), np.maximum(a, b)], axis=1).astype(np.int64) \
        if a.size else np.empty((0, 2), np.int64)
    return _ref_label_propagation(e, np.asarray(ids, dtype=np.int64))


def clusters_mismatch(engine: pd.DataFrame, reference: pd.DataFrame) -> pd.DataFrame:
    """Row-exact diff of two cluster tables -> one pinned mismatch count."""
    cols = ["member_id", "cluster_id", "cluster_size"]
    if len(engine) != len(reference):
        mism = max(len(engine), len(reference))
    else:
        mism = int((engine[cols].to_numpy() != reference[cols].to_numpy())
                   .any(axis=1).sum())
    return pd.DataFrame({"mismatch_rows": pd.array([mism], dtype="int64")})


# -- batched exact Levenshtein (Sorted Neighborhood confirm kernel) ---------

def levenshtein_batch(a, b, max_chars: int = 32) -> np.ndarray:
    """Exact Levenshtein distance for P string pairs, vectorized ACROSS
    the pair axis: the DP runs as La*Lb 1-D numpy ops over ALL pairs at
    once (cf. Wagner-Fischer), never a per-pair Python loop.  Strings
    are compared on their first ``max_chars`` characters (the SNM
    confirm contract — the sort prefix bounds the comparison window).

    Layout note: DP state is held (L+1, P) so every recurrence touches a
    CONTIGUOUS P-length row — this numpy build degrades badly on strided
    column access and 2-D accumulate (see CLAUDE.md sandbox gotchas).
    """
    A = np.asarray(a, dtype=f"U{max_chars}")
    B = np.asarray(b, dtype=f"U{max_chars}")
    P = len(A)
    if P == 0:
        return np.zeros(0, dtype=np.int64)
    Au = A.view(np.uint32).reshape(P, max_chars)
    Bu = B.view(np.uint32).reshape(P, max_chars)
    la = (Au != 0).sum(axis=1).astype(np.int64)
    lb = (Bu != 0).sum(axis=1).astype(np.int64)
    La = int(la.max()) if P else 0
    Lb = int(lb.max()) if P else 0
    BT = np.ascontiguousarray(Bu[:, :Lb].T) if Lb else np.zeros((0, P), np.uint32)
    prev = np.repeat(np.arange(Lb + 1, dtype=np.int32)[:, None], P, axis=1)
    res = prev.copy()  # captures pairs with la == 0 (distance = lb)
    for i in range(1, La + 1):
        ai = Au[:, i - 1]
        cost = (BT != ai[None, :]).astype(np.int32)         # (Lb, P)
        t = np.minimum(prev[1:] + 1, prev[:-1] + cost)      # (Lb, P)
        cur = np.empty_like(prev)
        cur[0] = i
        for j in range(1, Lb + 1):
            cur[j] = np.minimum(t[j - 1], cur[j - 1] + 1)
        hit = la == i
        if hit.any():
            res[:, hit] = cur[:, hit]
        prev = cur
    return res[lb, np.arange(P)].astype(np.int64)
