"""Distributed PageRank by hash-partitioned contribution exchange — the
second iterative graph workload beside ``dedup.distributed_components``,
sharing its plasma-refs iteration style (no per-step Dataset executor
spin-up; two ``grouped_map`` exchanges per iteration).

Semantics: symmetric (undirected) graph, damping d, FIXED iteration
count (deterministic across partition layouts up to float summation
order — the paired check query pins the micros drift at <= 2).  Per
iteration, partition p holds the rank rows and the src-tagged edges of
its nodes, computes contrib = rank[src]/deg[src] locally (degree falls
out of the co-located edges — no separate degree table), exchanges
contributions on dst, and sums: rank = (1-d)/N + d * sum(contrib).
Every node of a symmetric graph has in-edges, so no dangling-mass term.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from .shuffle import arrow_refs, grouped_map


@ray.remote
def _pr_symmetrize(t: pa.Table) -> pa.Table:
    src = t["src"].to_numpy().astype(np.int64)
    dst = t["dst"].to_numpy().astype(np.int64)
    return pa.table({
        "node": pa.array(np.concatenate([src, dst]), pa.int64()),
        "dst": pa.array(np.concatenate([dst, src]), pa.int64()),
        "is_edge": pa.array(np.ones(2 * len(src), np.int64), pa.int64()),
        "val": pa.array(np.zeros(2 * len(src), np.float64), pa.float64()),
    })


def _pr_nodes_sweep(t: pa.Table) -> pd.DataFrame:
    u = np.unique(t["node"].to_numpy())
    return pd.DataFrame({"node": u})


@ray.remote
def _pr_init_ranks(t: pa.Table, inv_n: float) -> pa.Table:
    nodes = t["node"].to_numpy().astype(np.int64)
    return pa.table({
        "node": pa.array(nodes, pa.int64()),
        "dst": pa.array(np.zeros(len(nodes), np.int64), pa.int64()),
        "is_edge": pa.array(np.zeros(len(nodes), np.int64), pa.int64()),
        "val": pa.array(np.full(len(nodes), inv_n, np.float64), pa.float64()),
    })


def _pr_contrib(t: pa.Table) -> pd.DataFrame:
    """One src partition: degree from the co-located edges, then one
    contribution row per half-edge keyed by its destination."""
    df = t.to_pandas()
    edges = df[df["is_edge"] == 1]
    ranks = df[df["is_edge"] == 0]
    idx = pd.Index(ranks["node"].to_numpy())
    deg = edges.groupby("node", sort=False)["dst"].transform("size").to_numpy(np.float64)
    pos = idx.get_indexer(edges["node"].to_numpy())
    r = ranks["val"].to_numpy()[np.clip(pos, 0, None)]
    r[pos < 0] = 0.0  # src with no rank row cannot occur on a consistent key
    return pd.DataFrame({
        "node": edges["dst"].to_numpy(np.int64),
        "dst": np.int64(0),
        "is_edge": np.int64(0),
        "val": r / deg,
    })


def _pr_sum(t: pa.Table, damping: float, inv_n: float) -> pd.DataFrame:
    df = t.to_pandas().groupby("node", sort=False)["val"].sum().reset_index()
    df["val"] = (1.0 - damping) * inv_n + damping * df["val"].to_numpy()
    df["dst"] = np.int64(0)
    df["is_edge"] = np.int64(0)
    return df[["node", "dst", "is_edge", "val"]]


@ray.remote
def _pr_nrows(t: pa.Table | None) -> int:
    return 0 if t is None else t.num_rows


def distributed_pagerank(edges_ds: "ray.data.Dataset", damping: float = 0.85,
                         iters: int = 15, n_partitions: int | None = None
                         ) -> pd.DataFrame:
    """(node, rank_micros) for every node of the symmetrized edge list
    after ``iters`` fixed power iterations."""
    sym_refs = [
        _pr_symmetrize.remote(r)
        for r in arrow_refs(edges_ds)
    ]
    n_half = int(sum(ray.get([_pr_nrows.remote(r) for r in sym_refs])))
    if n_partitions is None:
        n_partitions = int(max(4, min(32, n_half // 20_000 + 4)))

    node_refs = grouped_map(sym_refs, ["node"], _pr_nodes_sweep,
                            n_partitions=n_partitions, return_refs=True)
    n_nodes = int(sum(ray.get([_pr_nrows.remote(r) for r in node_refs])))
    inv_n = 1.0 / max(n_nodes, 1)

    rank_refs = [_pr_init_ranks.remote(r, inv_n) for r in node_refs]
    # edges partitioned ONCE by src; ranks live on the same node-hash key,
    # so each iteration's contrib pass needs no extra edge exchange
    edge_parts = grouped_map(sym_refs, ["node"], _pr_identity,
                             n_partitions=n_partitions, return_refs=True)
    for _ in range(iters):
        tagged = list(rank_refs) + list(edge_parts)
        cand = grouped_map(tagged, ["node"], _pr_contrib,
                           n_partitions=n_partitions, return_refs=True)
        rank_refs = grouped_map(
            cand, ["node"], _pr_sum,
            fn_kwargs={"damping": damping, "inv_n": inv_n},
            n_partitions=n_partitions, return_refs=True)

    tabs = [t for t in ray.get(rank_refs) if t is not None and t.num_rows]
    out = (pa.concat_tables(tabs, promote_options="default").to_pandas()
           if tabs else pd.DataFrame({"node": [], "val": []}))
    return pd.DataFrame({
        "node": out["node"].to_numpy(np.int64),
        "rank_micros": np.floor(out["val"].to_numpy(np.float64) * 1e6 + 0.5)
        .astype(np.int64),
    }).sort_values("node", kind="stable").reset_index(drop=True)


def _pr_identity(t: pa.Table) -> pa.Table:
    return t


def reference_pagerank(edges: pd.DataFrame, damping: float = 0.85,
                       iters: int = 15) -> pd.DataFrame:
    """Single-process numpy recompute with identical semantics, for the
    driver-visible check query."""
    src = edges["src"].to_numpy(np.int64)
    dst = edges["dst"].to_numpy(np.int64)
    s = np.concatenate([src, dst])
    d = np.concatenate([dst, src])
    nodes, s_idx = np.unique(s, return_inverse=True)
    d_idx = np.searchsorted(nodes, d)
    n = len(nodes)
    deg = np.bincount(s_idx, minlength=n).astype(np.float64)
    rank = np.full(n, 1.0 / n)
    for _ in range(iters):
        contrib = rank[s_idx] / deg[s_idx]
        rank = (1.0 - damping) / n + damping * np.bincount(
            d_idx, weights=contrib, minlength=n)
    return pd.DataFrame({
        "node": nodes,
        "rank_micros": np.floor(rank * 1e6 + 0.5).astype(np.int64),
    })
