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


# ---------------------------------------------------------------------------
# HITS (hubs & authorities, Kleinberg 1999) — DIRECTED graph, same
# resident-partition iteration style as distributed_pagerank: both edge
# orientations are hash-partitioned ONCE (fwd by src for the authority
# half-step, rev by dst for the hub half-step); each half-step runs one
# local task per partition and exchanges only locally-summed
# (node, partial) rows.  The score supports line up exactly: every fwd
# src receives a hub row each iteration (its edges contribute to it via
# rev) and every dst an authority row, so the searchsorted lookup in the
# contrib task never misses.  L2 normalization per half-step: per-
# partition sum-of-squares partials, summed driver-side in partition
# order (deterministic), scale applied by one tiny task per partition.
# ---------------------------------------------------------------------------


@ray.remote
def _hits_fwd(t: pa.Table) -> pa.Table:
    return pa.table({"node": t["src"].cast(pa.int64()),
                     "dst": t["dst"].cast(pa.int64())})


@ray.remote
def _hits_rev(t: pa.Table) -> pa.Table:
    return pa.table({"node": t["dst"].cast(pa.int64()),
                     "dst": t["src"].cast(pa.int64())})


@ray.remote
def _hits_init(edges: pa.Table) -> pa.Table:
    u = np.unique(edges["node"].to_numpy())
    return pa.table({"node": pa.array(u, pa.int64()),
                     "val": pa.array(np.ones(len(u)), pa.float64())})


@ray.remote
def _hits_contrib(edges: pa.Table, scores: pa.Table) -> pa.Table:
    """score[node] summed onto each resident edge's dst — the
    unnormalized half-step, pre-aggregated locally (no degree term,
    unlike PageRank)."""
    src = edges["node"].to_numpy()
    dst = edges["dst"].to_numpy()
    snode = scores["node"].to_numpy()
    sval = scores["val"].to_numpy()
    order = np.argsort(snode, kind="stable")
    pos = order[np.searchsorted(snode[order], src)]
    ud, dinv = np.unique(dst, return_inverse=True)
    sums = np.zeros(len(ud), np.float64)
    np.add.at(sums, dinv, sval[pos])
    return pa.table({"node": pa.array(ud, pa.int64()),
                     "val": pa.array(sums, pa.float64())})


def _hits_sum(t: pa.Table) -> pd.DataFrame:
    return t.to_pandas().groupby("node", sort=True)["val"].sum().reset_index()


@ray.remote
def _hits_sumsq(t: pa.Table | None) -> float:
    if t is None:
        return 0.0
    v = t["val"].to_numpy()
    return float(np.sum(v * v))


@ray.remote
def _hits_scale(t: pa.Table, scale: float) -> pa.Table:
    return pa.table({"node": t["node"],
                     "val": pa.array(t["val"].to_numpy() * scale,
                                     pa.float64())})


def _hits_normalized(parts: list) -> dict:
    """grouped_map indexed refs -> L2-normalized {partition: ref}.  The
    sum-of-squares partials are combined in PARTITION-INDEX order so the
    norm is deterministic for a fixed partition count."""
    parts = sorted(parts)
    sq = ray.get([_hits_sumsq.remote(r) for _, r in parts])
    total = float(np.sum(np.asarray(sq, np.float64)))
    scale = 1.0 / np.sqrt(total) if total > 0 else 1.0
    return {p: _hits_scale.remote(r, scale) for p, r in parts}


def distributed_hits(edges_ds: "ray.data.Dataset", iters: int = 20,
                     n_partitions: int | None = None) -> pd.DataFrame:
    """(node, hub_micros, auth_micros) for every node of the DIRECTED
    edge list after ``iters`` normalized HITS iterations.  Nodes with no
    out-edges have hub 0; no in-edges, authority 0 (exactly the
    reference semantics — zero entries never contribute to norms)."""
    refs = arrow_refs(edges_ds)
    fwd_src = [_hits_fwd.remote(r) for r in refs]
    rev_src = [_hits_rev.remote(r) for r in refs]
    n_half = int(sum(ray.get([_pr_nrows.remote(r) for r in fwd_src])))
    if n_partitions is None:
        n_partitions = int(max(4, min(32, n_half // 20_000 + 4)))
    fwd = grouped_map(fwd_src, ["node"], _pr_identity,
                      n_partitions=n_partitions, return_indexed_refs=True)
    rev = grouped_map(rev_src, ["node"], _pr_identity,
                      n_partitions=n_partitions, return_indexed_refs=True)
    fwd_d, rev_d = dict(fwd), dict(rev)

    h_refs = {p: _hits_init.remote(r) for p, r in fwd}
    a_refs: dict = {}
    for _ in range(iters):
        contribs = [_hits_contrib.remote(eref, h_refs[p])
                    for p, eref in fwd_d.items()]
        a_parts = grouped_map(contribs, ["node"], _hits_sum,
                              n_partitions=n_partitions,
                              return_indexed_refs=True)
        a_refs = _hits_normalized(a_parts)
        contribs = [_hits_contrib.remote(eref, a_refs[p])
                    for p, eref in rev_d.items()]
        h_parts = grouped_map(contribs, ["node"], _hits_sum,
                              n_partitions=n_partitions,
                              return_indexed_refs=True)
        h_refs = _hits_normalized(h_parts)

    def _collect(refs_d: dict, col: str) -> pd.DataFrame:
        tabs = [t for t in ray.get(list(refs_d.values()))
                if t is not None and t.num_rows]
        if not tabs:
            return pd.DataFrame({"node": pd.Series([], dtype=np.int64),
                                 col: pd.Series([], dtype=np.float64)})
        df = pa.concat_tables(tabs, promote_options="default").to_pandas()
        return pd.DataFrame({"node": df["node"].to_numpy(np.int64),
                             col: df["val"].to_numpy(np.float64)})

    out = _collect(h_refs, "hub").merge(_collect(a_refs, "auth"),
                                        on="node", how="outer")
    out = out.fillna(0.0).sort_values("node", kind="stable")
    return pd.DataFrame({
        "node": out["node"].to_numpy(np.int64),
        "hub_micros": np.floor(out["hub"].to_numpy() * 1e6 + 0.5)
        .astype(np.int64),
        "auth_micros": np.floor(out["auth"].to_numpy() * 1e6 + 0.5)
        .astype(np.int64),
    }).reset_index(drop=True)


def reference_hits(edges: pd.DataFrame, iters: int = 20) -> pd.DataFrame:
    """Single-process numpy recompute with identical semantics (zero
    entries excluded from nothing — they are simply zero)."""
    src = edges["src"].to_numpy(np.int64)
    dst = edges["dst"].to_numpy(np.int64)
    nodes = np.unique(np.concatenate([src, dst]))
    s_idx = np.searchsorted(nodes, src)
    d_idx = np.searchsorted(nodes, dst)
    n = len(nodes)
    hub = np.zeros(n)
    hub[np.unique(s_idx)] = 1.0
    auth = np.zeros(n)
    for _ in range(iters):
        auth = np.bincount(d_idx, weights=hub[s_idx], minlength=n)
        nrm = np.sqrt(np.sum(auth * auth))
        if nrm > 0:
            auth /= nrm
        hub = np.bincount(s_idx, weights=auth[d_idx], minlength=n)
        nrm = np.sqrt(np.sum(hub * hub))
        if nrm > 0:
            hub /= nrm
    return pd.DataFrame({
        "node": nodes,
        "hub_micros": np.floor(hub * 1e6 + 0.5).astype(np.int64),
        "auth_micros": np.floor(auth * 1e6 + 0.5).astype(np.int64),
    })
