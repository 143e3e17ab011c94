"""Similarity search over an embedding column (``list<float>``).

Baseline: brute-force cosine top-k — the query matrix is broadcast once
(``ray.put``), every batch does one numpy matmul, per-block top-k
candidates are merged per query in a final small groupby.  Scale path:
IVF (inverted-file) — k-means-style coarse centroids partition the
vectors; queries probe only the ``n_probe`` nearest cells, so the matmul
touches a fraction of the corpus.  Both are deterministic (fixed seed,
ties broken by ascending id).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


def _normalize(mat: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(mat, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return mat / n


def _stack(batch_col) -> np.ndarray:
    return np.stack(batch_col.to_pandas().to_numpy()).astype(np.float64)


# "masked out" similarity — NOT int64 min: the selection argsorts -micros,
# and negating int64 min wraps back to itself, which would sort masked
# entries FIRST instead of last
_MICROS_SENTINEL = -(np.int64(1) << np.int64(62))


def _select_block_topk(qids: np.ndarray, ids: np.ndarray,
                       micros: np.ndarray, k: int) -> pa.Table:
    """Exact per-block top-k in (micros desc, vec_id asc) order.

    Working in the micros-scaled int domain with an explicit vec_id
    tie-break makes the partial selection EXACT: when tied similarities
    straddle the per-block k-th-place cutoff, the globally-merged result
    still matches the SQL oracle's row_number ordering bit-for-bit (an
    argpartition on raw floats keeps an arbitrary tied member)."""
    kk = min(k, micros.shape[1])
    # sort columns by vec_id once, then a stable argsort on -micros per
    # query yields (micros desc, vec_id asc) exactly
    perm = np.argsort(ids, kind="stable")
    ids_s = ids[perm]
    micros_s = micros[:, perm]
    sel = np.argsort(-micros_s, axis=1, kind="stable")[:, :kk]
    rows = np.repeat(np.arange(len(qids)), kk)
    cols = sel.ravel()
    return pa.table(
        {
            "query_id": pa.array(qids[rows], pa.int64()),
            "vec_id": pa.array(ids_s[cols], pa.int64()),
            "cos_sim_micros": pa.array(micros_s[rows, cols], pa.int64()),
        }
    )


def _merge_topk(g: pd.DataFrame, k: int) -> pd.DataFrame:
    g = g[g["cos_sim_micros"] != _MICROS_SENTINEL].copy()
    g = g.sort_values(["cos_sim_micros", "vec_id"], ascending=[False, True], kind="stable").head(k)
    g = g.assign(rank=np.arange(1, len(g) + 1, dtype=np.int64))
    return g[["query_id", "rank", "vec_id", "cos_sim_micros"]]


def brute_force_topk(
    ds: "ray.data.Dataset",
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> pd.DataFrame:
    """Exact cosine top-k per query: (query_id, rank, vec_id, cos_sim_micros).

    Per-block partial top-k inside ``map_batches`` (so only n_queries × k
    candidate rows per block leave the worker), then a final merge per
    query.  Deterministic ordering: micros desc, vec_id asc, enforced in
    BOTH the block partial and the merge (floor(x*1e6+0.5) sidesteps
    round-half-even vs half-away drift across engines).
    """
    q_n = _normalize(np.asarray(queries, dtype=np.float64))
    q_ref = ray.put((np.asarray(query_ids, dtype=np.int64), q_n))

    def block_topk(batch: pa.Table) -> pa.Table:
        qids, qmat = ray.get(q_ref)
        ids = batch[id_col].to_numpy().astype(np.int64)
        mat = _normalize(_stack(batch[vec_col]))
        sims = qmat @ mat.T  # (nq, nb)
        micros = np.floor(sims * 1e6 + 0.5).astype(np.int64)
        if exclude_self:
            micros[qids[:, None] == ids[None, :]] = _MICROS_SENTINEL
        return _select_block_topk(qids, ids, micros, k)

    cands = ds.map_batches(block_topk, batch_format="pyarrow")
    out = cands.groupby("query_id").map_groups(
        lambda g: _merge_topk(g, k), batch_format="pandas")
    return out.to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# IVF (inverted file) — the scale path
# ---------------------------------------------------------------------------

def train_centroids(sample: np.ndarray, n_cells: int, iters: int = 10, seed: int = 0) -> np.ndarray:
    """Deterministic Lloyd k-means on a driver-side sample (coarse
    quantizer training is always a small-sample job, even at scale)."""
    rng = np.random.RandomState(seed)
    x = _normalize(np.asarray(sample, dtype=np.float64))
    idx = rng.choice(len(x), size=min(n_cells, len(x)), replace=False)
    c = x[idx].copy()
    for _ in range(iters):
        sims = x @ c.T
        assign = sims.argmax(axis=1)
        for j in range(len(c)):
            m = assign == j
            if m.any():
                v = x[m].mean(axis=0)
                nv = np.linalg.norm(v)
                if nv > 0:
                    c[j] = v / nv
    return c


def ivf_assign(ds: "ray.data.Dataset", centroids: np.ndarray,
               id_col: str = "vec_id", vec_col: str = "embedding") -> "ray.data.Dataset":
    """Tag every vector with its coarse cell id (one matmul per batch).
    Downstream this is the partition key: co-locating a cell's vectors
    makes the probe touch only n_probe cells' blocks."""
    c_ref = ray.put(np.asarray(centroids, dtype=np.float64))

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(c_ref)
        mat = _normalize(_stack(batch[vec_col]))
        cell = (mat @ c.T).argmax(axis=1).astype(np.int64)
        return batch.append_column("cell", pa.array(cell, pa.int64()))

    return ds.map_batches(assign, batch_format="pyarrow")


def ivf_topk(
    ds: "ray.data.Dataset",
    queries: np.ndarray,
    query_ids: np.ndarray,
    centroids: np.ndarray,
    k: int = 5,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> pd.DataFrame:
    """Approximate top-k: probe only the n_probe cells nearest each query.

    Same output contract as ``brute_force_topk``; recall < 1 when the true
    neighbor lives in an unprobed cell (measure with ``ivf_recall``).
    """
    c = np.asarray(centroids, dtype=np.float64)
    q_n = _normalize(np.asarray(queries, dtype=np.float64))
    q_cells = np.argsort(-(q_n @ c.T), axis=1, kind="stable")[:, :n_probe]
    tagged = ivf_assign(ds, c, id_col, vec_col)
    # per-query probe set → a (query, cell) filter broadcast to blocks
    q_ref = ray.put((np.asarray(query_ids, dtype=np.int64), q_n, q_cells))

    def block_topk(batch: pa.Table) -> pa.Table:
        qids, qmat, qcells = ray.get(q_ref)
        ids = batch[id_col].to_numpy().astype(np.int64)
        cells = batch["cell"].to_numpy().astype(np.int64)
        mat = _normalize(_stack(batch[vec_col]))
        sims = qmat @ mat.T
        micros = np.floor(sims * 1e6 + 0.5).astype(np.int64)
        # mask out vectors in cells this query does not probe
        probe_mask = (cells[None, :, None] == qcells[:, None, :]).any(axis=2)
        if exclude_self:
            probe_mask &= qids[:, None] != ids[None, :]
        micros[~probe_mask] = _MICROS_SENTINEL
        return _select_block_topk(qids, ids, micros, k)

    cands = tagged.map_batches(block_topk, batch_format="pyarrow")
    out = cands.groupby("query_id").map_groups(
        lambda g: _merge_topk(g, k), batch_format="pandas")
    return out.to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)


def ivfpq_topk(
    ds: "ray.data.Dataset",
    queries: np.ndarray,
    query_ids: np.ndarray,
    centroids: np.ndarray,
    books: np.ndarray,
    k: int = 5,
    n_probe: int = 4,
    rerank: int = 32,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> pd.DataFrame:
    """IVF-PQ (the FAISS-canonical index): probe only the ``n_probe``
    coarse cells nearest each query AND scan the probed vectors by ADC
    lookups over their uint8 codes, exact-reranking only the per-query
    shortlist.  Composes the two pruning axes a 100-TB embedding corpus
    needs together — cell masking bounds how much of the corpus is
    touched, PQ bounds the bytes per touched vector — with the same
    output contract as ``brute_force_topk``."""
    c = np.asarray(centroids, dtype=np.float64)
    b = np.asarray(books, np.float64)
    m_sub, _, ds_ = b.shape
    q_n = _normalize(np.asarray(queries, dtype=np.float64))
    q_cells = np.argsort(-(q_n @ c.T), axis=1, kind="stable")[:, :n_probe]
    lut = np.stack([q_n[:, m * ds_:(m + 1) * ds_] @ b[m].T for m in range(m_sub)])
    tagged = ivf_assign(ds, c, id_col, vec_col)
    q_ref = ray.put((np.asarray(query_ids, np.int64), q_n, q_cells, lut, b))

    def block_topk(batch: pa.Table) -> pa.Table:
        qids, qmat, qcells, lut_, b_ = ray.get(q_ref)
        ids = batch[id_col].to_numpy().astype(np.int64)
        cells = batch["cell"].to_numpy().astype(np.int64)
        mat = _normalize(_stack(batch[vec_col]))
        codes = _pq_codes(mat, b_)
        approx = np.zeros((len(qids), len(ids)), np.float64)
        for m in range(len(lut_)):
            approx += lut_[m][:, codes[:, m]]
        probe_mask = (cells[None, :, None] == qcells[:, None, :]).any(axis=2)
        if exclude_self:
            probe_mask &= qids[:, None] != ids[None, :]
        approx[~probe_mask] = -np.inf
        rr = min(rerank, len(ids))
        shortlist = np.argpartition(-approx, rr - 1, axis=1)[:, :rr]
        micros = np.full((len(qids), len(ids)), _MICROS_SENTINEL, np.int64)
        for qi in range(len(qids)):
            cols = shortlist[qi][np.isfinite(approx[qi, shortlist[qi]])]
            if len(cols):
                ex = qmat[qi] @ mat[cols].T
                micros[qi, cols] = np.floor(ex * 1e6 + 0.5).astype(np.int64)
        return _select_block_topk(qids, ids, micros, k)

    cands = tagged.map_batches(block_topk, batch_format="pyarrow")
    out = cands.groupby("query_id").map_groups(
        lambda g: _merge_topk(g, k), batch_format="pandas")
    return out.to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)


def ivf_recall(exact: pd.DataFrame, approx: pd.DataFrame) -> float:
    """Recall@k of the IVF result vs the brute-force ground truth."""
    e = exact.groupby("query_id")["vec_id"].apply(set)
    a = approx.groupby("query_id")["vec_id"].apply(set)
    scores = [len(e[q] & a.get(q, set())) / max(len(e[q]), 1) for q in e.index]
    return float(np.mean(scores)) if scores else 1.0


# ---------------------------------------------------------------------------
# PQ (product quantization) — the compressed-corpus scale path
# ---------------------------------------------------------------------------

def train_pq(sample: np.ndarray, m_sub: int = 8, n_codes: int = 64,
             iters: int = 10, seed: int = 0) -> np.ndarray:
    """Deterministic per-subspace Lloyd k-means codebooks, shape
    (m_sub, n_codes, d/m_sub).  Like ``train_centroids``, codebook
    training is a small-sample driver job even at corpus scale."""
    x = _normalize(np.asarray(sample, dtype=np.float64))
    n, d = x.shape
    assert d % m_sub == 0, "dim must divide evenly into subspaces"
    ds_ = d // m_sub
    rng = np.random.RandomState(seed)
    books = np.empty((m_sub, min(n_codes, n), ds_), np.float64)
    for m in range(m_sub):
        sub = x[:, m * ds_:(m + 1) * ds_]
        idx = rng.choice(n, size=min(n_codes, n), replace=False)
        c = sub[idx].copy()
        for _ in range(iters):
            d2 = ((sub[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for j in range(len(c)):
                msk = assign == j
                if msk.any():
                    c[j] = sub[msk].mean(axis=0)
        books[m] = c
    return books


def _pq_codes(mat_n: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, m_sub) uint8 code matrix: per subspace, index of the L2-nearest
    codeword (argmin keeps the FIRST minimum — deterministic ties)."""
    m_sub, n_codes, ds_ = books.shape
    out = np.empty((len(mat_n), m_sub), np.uint8)
    for m in range(m_sub):
        sub = mat_n[:, m * ds_:(m + 1) * ds_]
        d2 = ((sub[:, None, :] - books[m][None, :, :]) ** 2).sum(axis=2)
        out[:, m] = d2.argmin(axis=1).astype(np.uint8)
    return out


def pq_assign(ds: "ray.data.Dataset", books: np.ndarray,
              vec_col: str = "embedding") -> "ray.data.Dataset":
    """Tag every vector with its PQ code column (``fixed_size_list<uint8>``
    — m_sub bytes instead of d floats, the stored/compressed form a
    100-TB corpus would persist and serve from)."""
    b_ref = ray.put(np.asarray(books, np.float64))
    m_sub = books.shape[0]

    def assign(batch: pa.Table) -> pa.Table:
        b = ray.get(b_ref)
        codes = _pq_codes(_normalize(_stack(batch[vec_col])), b)
        col = pa.FixedSizeListArray.from_arrays(
            pa.array(codes.ravel(), pa.uint8()), m_sub)
        return batch.append_column("pq_code", col)

    return ds.map_batches(assign, batch_format="pyarrow")


def pq_topk(
    ds: "ray.data.Dataset",
    queries: np.ndarray,
    query_ids: np.ndarray,
    books: np.ndarray,
    k: int = 5,
    rerank: int = 32,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> pd.DataFrame:
    """ADC-pruned + exact-reranked top-k (same output contract as
    ``brute_force_topk``): per block, asymmetric-distance lookups against
    the uint8 codes shortlist ``rerank`` candidates per query (one
    (n_codes)-table gather per subspace — no full matmul), then ONLY the
    shortlist gets exact similarities.  Composes with IVF cells the same
    way ``ivf_topk`` masks unprobed cells; kept orthogonal here so each
    path is independently measurable."""
    b = np.asarray(books, np.float64)
    m_sub, n_codes, ds_ = b.shape
    q_n = _normalize(np.asarray(queries, dtype=np.float64))
    # ADC tables: lut[m][q, code] = q_m . codeword
    lut = np.stack([q_n[:, m * ds_:(m + 1) * ds_] @ b[m].T for m in range(m_sub)])
    q_ref = ray.put((np.asarray(query_ids, np.int64), q_n, lut, b))

    def block_topk(batch: pa.Table) -> pa.Table:
        qids, qmat, lut_, b_ = ray.get(q_ref)
        ids = batch[id_col].to_numpy().astype(np.int64)
        mat = _normalize(_stack(batch[vec_col]))
        codes = _pq_codes(mat, b_)
        approx = np.zeros((len(qids), len(ids)), np.float64)
        for m in range(len(lut_)):
            approx += lut_[m][:, codes[:, m]]
        if exclude_self:
            approx[qids[:, None] == ids[None, :]] = -np.inf
        rr = min(rerank, len(ids))
        shortlist = np.argpartition(-approx, rr - 1, axis=1)[:, :rr]
        # exact rerank ONLY on the shortlisted columns
        micros = np.full((len(qids), len(ids)), _MICROS_SENTINEL, np.int64)
        for qi in range(len(qids)):
            cols = shortlist[qi]
            ex = qmat[qi] @ mat[cols].T
            micros[qi, cols] = np.floor(ex * 1e6 + 0.5).astype(np.int64)
        if exclude_self:
            micros[qids[:, None] == ids[None, :]] = _MICROS_SENTINEL
        return _select_block_topk(qids, ids, micros, k)

    cands = ds.map_batches(block_topk, batch_format="pyarrow")
    out = cands.groupby("query_id").map_groups(
        lambda g: _merge_topk(g, k), batch_format="pandas")
    return out.to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
