"""SemDeDup-style semantic deduplication over an embedding column.

The canonical large-corpus recipe (Abbas et al. 2023, "SemDeDup"):
spherical k-means partitions the corpus into semantic clusters, then
within each cluster an item is a duplicate iff its cosine similarity to
any LOWER-id item of the same cluster reaches the threshold — one
representative per semantic neighborhood survives, and no cross-cluster
pair is ever scored, so the quadratic confirm is bounded per cluster.

Scale shape (the 100-TB contract):
- k-means runs as distributed EM over plasma block refs: per iteration
  each block computes per-centroid float64 partial sums (k x (d+1)
  numbers, independent of block size), the driver combines them, and the
  refreshed centroids are re-broadcast with one ``ray.put``.  Vectors
  never leave their blocks; only k x d floats move per round.
- The intra-cluster confirm is a ``grouped_map`` hash exchange on the
  cluster id — identical partitioning budget to the dedup sweeps — and
  its cost is sum(m_c^2) over cluster sizes, bounded by choosing
  k ~ n / target_cluster_size (k is a parameter, not a constant, at
  scale).
- Centroids are rounded to 1e-6 after every update so the argmax
  assignment is invariant to the float summation order of the
  block-parallel reduction; this is what makes the distributed run
  bit-identical to the single-process reference below and hence
  inline-checkable (the ``semantic_dedup_check`` query pins 0
  mismatches, the same contract as the distributed-CC queries).

Reference analog: the dedup role of `save_fingerprints.py` (exact key
dedup, reference src/flink_job/save_fingerprints.py:120-148) lifted to
embedding space, which the reference has no counterpart for — this is
one of the target-new LLM-curation operators.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from .shuffle import arrow_refs, grouped_map
from .similarity import _normalize, _stack

_ROUND = 6  # centroid decimals: order-invariance quantum for the EM reduce


@ray.remote
def _block_ids_vecs(tab: pa.Table, id_col: str, vec_col: str, k: int):
    """The block's k lowest-id (id, vector) rows — init candidates."""
    ids = tab[id_col].to_numpy().astype(np.int64)
    mat = _normalize(_stack(tab[vec_col]))
    o = np.argsort(ids, kind="stable")[:k]
    return ids[o], mat[o]


@ray.remote
def _kmeans_partials(tab: pa.Table, c_ref, id_col: str, vec_col: str):
    """Per-centroid (sum, count) partials for one block: k x (d+1)
    float64 numbers regardless of block size."""
    c = c_ref
    mat = _normalize(_stack(tab[vec_col]))
    assign = (mat @ c.T).argmax(axis=1)
    k, d = c.shape
    sums = np.zeros((k, d), dtype=np.float64)
    np.add.at(sums, assign, mat)
    counts = np.bincount(assign, minlength=k).astype(np.int64)
    return sums, counts


def _centroid_step(c: np.ndarray, sums: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Driver-side combine: mean -> renormalize -> round.  Empty cells
    keep their previous centroid (standard Lloyd fallback)."""
    new = c.copy()
    nz = counts > 0
    new[nz] = sums[nz] / counts[nz, None]
    norms = np.linalg.norm(new, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return np.round(new / norms, _ROUND)


def distributed_kmeans(
    ds: "ray.data.Dataset",
    k: int = 16,
    iters: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[np.ndarray, list]:
    """Deterministic spherical k-means by distributed EM on plasma refs.

    Init = the k globally-lowest-id vectors (each block nominates its k
    lowest, driver merges) — seed-free and exactly replayable by the
    single-process reference.  Returns (centroids, block refs) so callers
    reuse the materialized blocks for the assignment pass."""
    refs = arrow_refs(ds)
    nom = ray.get([_block_ids_vecs.remote(r, id_col, vec_col, k) for r in refs])
    ids = np.concatenate([a for a, _ in nom])
    mats = np.concatenate([m for _, m in nom])
    o = np.argsort(ids, kind="stable")[:k]
    c = np.round(mats[o], _ROUND)
    for _ in range(iters):
        c_ref = ray.put(c)
        parts = ray.get([
            _kmeans_partials.remote(r, c_ref, id_col, vec_col) for r in refs
        ])
        sums = np.sum([s for s, _ in parts], axis=0)
        counts = np.sum([n for _, n in parts], axis=0)
        c = _centroid_step(c, sums, counts)
    return c, refs


@ray.remote
def _assign_block(tab: pa.Table, c_ref, id_col: str, vec_col: str) -> pa.Table:
    c = c_ref
    ids = tab[id_col].to_numpy().astype(np.int64)
    mat = _normalize(_stack(tab[vec_col]))
    cell = (mat @ c.T).argmax(axis=1).astype(np.int64)
    return pa.table({
        id_col: pa.array(ids, pa.int64()),
        "cluster_id": pa.array(cell, pa.int64()),
        vec_col: tab[vec_col],
    })


def _semdedup_sweep(t: pa.Table, id_col: str, vec_col: str,
                    threshold_micros: int) -> pd.DataFrame:
    """One hash partition = several whole clusters.  Per cluster: one
    normalized matmul, strict-upper-triangle max per column = max cosine
    to any lower-id member, compared at micros precision."""
    ids = t[id_col].to_numpy().astype(np.int64)
    cell = t["cluster_id"].to_numpy().astype(np.int64)
    mat = _normalize(_stack(t[vec_col]))
    o = np.lexsort((ids, cell))
    ids, cell, mat = ids[o], cell[o], mat[o]
    out_ids, out_cell, out_keep, out_sim = [], [], [], []
    starts = np.flatnonzero(np.r_[True, cell[1:] != cell[:-1]])
    bounds = np.r_[starts, len(cell)]
    for s, e in zip(bounds[:-1], bounds[1:]):
        m = e - s
        sub = mat[s:e]
        sims = sub @ sub.T
        micros = np.floor(sims * 1e6 + 0.5).astype(np.int64)
        # max over strictly-lower-id members; first member has none
        tri = np.tril(np.ones((m, m), dtype=bool), k=-1)
        micros_masked = np.where(tri, micros, np.int64(-2_000_000))
        prior = micros_masked.max(axis=1)
        out_ids.append(ids[s:e])
        out_cell.append(cell[s:e])
        out_keep.append((prior < threshold_micros).astype(np.int64))
        out_sim.append(prior)
    return pd.DataFrame({
        "vec_id": np.concatenate(out_ids) if out_ids else np.array([], np.int64),
        "cluster_id": np.concatenate(out_cell) if out_cell else np.array([], np.int64),
        "is_kept": np.concatenate(out_keep) if out_keep else np.array([], np.int64),
        "max_prior_sim_micros": np.concatenate(out_sim) if out_sim else np.array([], np.int64),
    })


def semantic_dedup_table(
    ds: "ray.data.Dataset",
    threshold: float = 0.95,
    k: int = 16,
    iters: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """Full SemDeDup table: vec_id, cluster_id, is_kept,
    max_prior_sim_micros (max cosine to a lower-id same-cluster member;
    -2_000_000 sentinel for the cluster's lowest id, below the -1e6
    cosine floor)."""
    thr = int(np.floor(threshold * 1e6 + 0.5))
    c, refs = distributed_kmeans(ds, k=k, iters=iters,
                                 id_col=id_col, vec_col=vec_col)
    c_ref = ray.put(c)
    tagged = [_assign_block.remote(r, c_ref, id_col, vec_col) for r in refs]
    out = grouped_map(tagged, ["cluster_id"], _semdedup_sweep,
                      fn_kwargs={"id_col": id_col, "vec_col": vec_col,
                                 "threshold_micros": thr})
    df = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    return df.sort_values(["cluster_id", "vec_id"]).reset_index(drop=True)


def semantic_dedup_reference(
    ids: np.ndarray,
    vecs: np.ndarray,
    threshold: float = 0.95,
    k: int = 16,
    iters: int = 8,
) -> pd.DataFrame:
    """Single-process NumPy reference: the same init, EM, rounding and
    confirm rules as the distributed path, with no blocking — the
    independent recompute ``semantic_dedup_check`` holds the engine to."""
    thr = int(np.floor(threshold * 1e6 + 0.5))
    o = np.argsort(ids, kind="stable")
    ids, vecs = np.asarray(ids)[o], _normalize(np.asarray(vecs, np.float64))[o]
    c = np.round(vecs[:k], _ROUND)
    for _ in range(iters):
        assign = (vecs @ c.T).argmax(axis=1)
        sums = np.zeros_like(c)
        np.add.at(sums, assign, vecs)
        counts = np.bincount(assign, minlength=len(c)).astype(np.int64)
        c = _centroid_step(c, sums, counts)
    cell = (vecs @ c.T).argmax(axis=1).astype(np.int64)
    rows = []
    for cl in np.unique(cell):
        m = cell == cl
        sub, sid = vecs[m], ids[m]
        micros = np.floor(sub @ sub.T * 1e6 + 0.5).astype(np.int64)
        tri = np.tril(np.ones(micros.shape, dtype=bool), k=-1)
        prior = np.where(tri, micros, np.int64(-2_000_000)).max(axis=1)
        rows.append(pd.DataFrame({
            "vec_id": sid, "cluster_id": cl,
            "is_kept": (prior < thr).astype(np.int64),
            "max_prior_sim_micros": prior,
        }))
    return (pd.concat(rows, ignore_index=True)
            .sort_values(["cluster_id", "vec_id"]).reset_index(drop=True))


def semantic_dedup_mismatch(
    ds: "ray.data.Dataset",
    threshold: float = 0.95,
    k: int = 16,
    iters: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """Engine vs single-process reference on the same vectors: count of
    disagreeing rows across all four output columns (expected 0)."""
    eng = semantic_dedup_table(ds, threshold, k, iters, id_col, vec_col)
    tabs = ray.get(arrow_refs(ds))
    ids = np.concatenate([t[id_col].to_numpy() for t in tabs]).astype(np.int64)
    vecs = np.concatenate([_stack(t[vec_col]) for t in tabs])
    ref = semantic_dedup_reference(ids, vecs, threshold, k, iters)
    cols = ["vec_id", "cluster_id", "is_kept", "max_prior_sim_micros"]
    n = max(len(eng), len(ref))
    if len(eng) != len(ref):
        mism = n
    else:
        mism = int((eng[cols].to_numpy() != ref[cols].to_numpy()).any(axis=1).sum())
    return pd.DataFrame({"mismatch_rows": pd.array([mism], dtype="int64")})
