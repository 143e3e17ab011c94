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


def brute_force_topk(
    ds: "ray.data.Dataset",
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> pd.DataFrame:
    """Exact cosine top-k per query: (query_id, rank, vec_id, cos_sim).

    Per-block partial top-k inside ``map_batches`` (so only n_queries × k
    candidate rows per block leave the worker), then a final merge per
    query.  Deterministic ordering: sim desc, vec_id asc; sims rounded to
    6 dp for cross-engine comparability.
    """
    q_n = _normalize(np.asarray(queries, dtype=np.float64))
    q_ref = ray.put((np.asarray(query_ids, dtype=np.int64), q_n))

    def block_topk(batch: pa.Table) -> pa.Table:
        qids, qmat = ray.get(q_ref)
        ids = batch[id_col].to_numpy().astype(np.int64)
        mat = _normalize(_stack(batch[vec_col]))
        sims = qmat @ mat.T  # (nq, nb)
        if exclude_self:
            mask = qids[:, None] == ids[None, :]
            sims = np.where(mask, -np.inf, sims)
        kk = min(k, sims.shape[1])
        # partial top-k per query within this block
        part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        rows = np.repeat(np.arange(len(qids)), kk)
        cols = part.ravel()
        return pa.table(
            {
                "query_id": pa.array(qids[rows], pa.int64()),
                "vec_id": pa.array(ids[cols], pa.int64()),
                "cos_sim": pa.array(sims[rows, cols], pa.float64()),
            }
        )

    cands = ds.map_batches(block_topk, batch_format="pyarrow")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g[np.isfinite(g["cos_sim"])].copy()
        # micros-scaled int ordering: identical tie-breaks across engines
        # (floor(x*1e6+0.5) sidesteps round-half-even vs half-away drift)
        g["cos_sim_micros"] = np.floor(g["cos_sim"] * 1e6 + 0.5).astype(np.int64)
        g = g.sort_values(["cos_sim_micros", "vec_id"], ascending=[False, True], kind="stable").head(k)
        g = g.assign(rank=np.arange(1, len(g) + 1, dtype=np.int64))
        return g[["query_id", "rank", "vec_id", "cos_sim_micros"]]

    out = cands.groupby("query_id").map_groups(merge, batch_format="pandas")
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
        # mask out vectors in cells this query does not probe
        probe_mask = (cells[None, :, None] == qcells[:, None, :]).any(axis=2)
        if exclude_self:
            probe_mask &= qids[:, None] != ids[None, :]
        sims = np.where(probe_mask, sims, -np.inf)
        kk = min(k, sims.shape[1])
        part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        rows = np.repeat(np.arange(len(qids)), kk)
        cols = part.ravel()
        return pa.table(
            {
                "query_id": pa.array(qids[rows], pa.int64()),
                "vec_id": pa.array(ids[cols], pa.int64()),
                "cos_sim": pa.array(sims[rows, cols], pa.float64()),
            }
        )

    cands = tagged.map_batches(block_topk, batch_format="pyarrow")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g[np.isfinite(g["cos_sim"])].copy()
        # micros-scaled int ordering: identical tie-breaks across engines
        # (floor(x*1e6+0.5) sidesteps round-half-even vs half-away drift)
        g["cos_sim_micros"] = np.floor(g["cos_sim"] * 1e6 + 0.5).astype(np.int64)
        g = g.sort_values(["cos_sim_micros", "vec_id"], ascending=[False, True], kind="stable").head(k)
        g = g.assign(rank=np.arange(1, len(g) + 1, dtype=np.int64))
        return g[["query_id", "rank", "vec_id", "cos_sim_micros"]]

    out = cands.groupby("query_id").map_groups(merge, batch_format="pandas")
    return out.to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)


def ivf_recall(exact: pd.DataFrame, approx: pd.DataFrame) -> float:
    """Recall@k of the IVF result vs the brute-force ground truth."""
    e = exact.groupby("query_id")["vec_id"].apply(set)
    a = approx.groupby("query_id")["vec_id"].apply(set)
    scores = [len(e[q] & a.get(q, set())) / max(len(e[q]), 1) for q in e.index]
    return float(np.mean(scores)) if scores else 1.0
