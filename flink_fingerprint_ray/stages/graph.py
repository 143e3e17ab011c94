"""Distributed PageRank by hash-partitioned contribution exchange — the
second iterative graph workload beside ``dedup.distributed_components``,
sharing its plasma-refs iteration style (no per-step Dataset executor
spin-up).

Semantics: symmetric (undirected) graph, damping d, FIXED iteration
count (deterministic across partition layouts up to float summation
order — the paired check query pins the micros drift at <= 2).

Scale shape (one exchange per iteration, edges never move after setup):
edges are hash-partitioned by src ONCE; each iteration runs one LOCAL
task per partition that joins its resident edges against its resident
rank rows (degree falls out of the co-located edges — no separate
degree table), pre-aggregates contributions by destination WITHIN the
partition, and only those (dst, partial-sum) rows cross the exchange.
The sum side lands on the same node-hash key, so the new rank
partition p pairs with edge partition p for the next iteration.  Every
node of a symmetric graph has in-edges, so no dangling-mass term.
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
    })


@ray.remote
def _pr_unique_nodes(t: pa.Table) -> pa.Table:
    """Partition p's node set = unique srcs of its resident half-edges
    (partitioning is by node hash, so this IS the partition's keyspace)."""
    return pa.table({"node": pa.array(np.unique(t["node"].to_numpy()), pa.int64())})


@ray.remote
def _pr_init_ranks(nodes: pa.Table, inv_n: float) -> pa.Table:
    n = nodes.num_rows
    return pa.table({
        "node": nodes["node"],
        "val": pa.array(np.full(n, inv_n, np.float64), pa.float64()),
    })


@ray.remote
def _pr_contrib_local(edges: pa.Table, ranks: pa.Table) -> pa.Table:
    """One resident partition: rank[src]/deg[src] per half-edge, then a
    local sum by destination so only (dst, partial) rows hit the wire."""
    src = edges["node"].to_numpy()
    dst = edges["dst"].to_numpy()
    rnode = ranks["node"].to_numpy()
    rval = ranks["val"].to_numpy()
    # src values are a subset of rnode (both derive from this partition's
    # node set), so searchsorted on the sorted-unique rank table is exact
    order = np.argsort(rnode, kind="stable")
    pos = order[np.searchsorted(rnode[order], src)]
    # degree of each src from the co-located edges
    u, inv, cnt = np.unique(src, return_inverse=True, return_counts=True)
    contrib = rval[pos] / cnt[inv].astype(np.float64)
    # local pre-aggregation by destination
    ud, dinv = np.unique(dst, return_inverse=True)
    sums = np.zeros(len(ud), np.float64)
    np.add.at(sums, dinv, contrib)
    return pa.table({
        "node": pa.array(ud, pa.int64()),
        "val": pa.array(sums, pa.float64()),
    })


def _pr_sum(t: pa.Table, damping: float, inv_n: float) -> pd.DataFrame:
    df = t.to_pandas().groupby("node", sort=True)["val"].sum().reset_index()
    df["val"] = (1.0 - damping) * inv_n + damping * df["val"].to_numpy()
    return df[["node", "val"]]


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

    # edges partitioned ONCE by src; indexed so partition p's edges can be
    # re-paired with partition p's rank rows every iteration
    edge_parts = grouped_map(sym_refs, ["node"], _pr_identity,
                             n_partitions=n_partitions,
                             return_indexed_refs=True)
    node_refs = {p: _pr_unique_nodes.remote(r) for p, r in edge_parts}
    n_nodes = int(sum(ray.get([_pr_nrows.remote(r) for r in node_refs.values()])))
    inv_n = 1.0 / max(n_nodes, 1)

    rank_refs = {p: _pr_init_ranks.remote(node_refs[p], inv_n)
                 for p, _ in edge_parts}
    for _ in range(iters):
        # local pass: no edge or rank row crosses the object store here
        contribs = [_pr_contrib_local.remote(eref, rank_refs[p])
                    for p, eref in edge_parts]
        # the ONLY exchange of the iteration: locally-summed contribution
        # rows, landing on the same node-hash key as the edge partitions
        rank_refs = dict(grouped_map(
            contribs, ["node"], _pr_sum,
            fn_kwargs={"damping": damping, "inv_n": inv_n},
            n_partitions=n_partitions, return_indexed_refs=True))

    tabs = [t for t in ray.get(list(rank_refs.values()))
            if t is not None and t.num_rows]
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
