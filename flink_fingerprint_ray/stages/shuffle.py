"""Manual hash-shuffle grouped-map operator.

``ds.groupby(keys).map_groups(fn)`` dispatches the UDF once per group —
fine for hundreds of groups, pathological for 10^4-10^6 (per-group
overhead ~1-2 ms dominates).  ``groupby().aggregate()`` avoids that but
runs a sort-based shuffle with extra Dataset executions (boundary
sampling), and cannot express non-decomposable stats (median) or ordered
per-key scans.

``grouped_map`` is the scale path (SURVEY.md §2.5 A1 note): split every
block by ``hash(key) % P`` (one task per block, P returns), then ONE task
per partition concatenates its slices and applies a VECTORIZED function
over the whole partition (pandas groupby.agg / sorted numpy sweeps — no
per-group Python dispatch).  All rows of a key land in exactly one
partition, so any per-key computation is legal inside ``fn``.

Partitioning assumption: key cardinality ≫ P and no single key's group
exceeds a worker's memory; hot-key mitigation is the caller's salting
(SURVEY.md §7.3).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


def arrow_refs(ds: "ray.data.Dataset") -> list:
    """Execute ``ds`` ONCE and return its Arrow block refs.

    ``Dataset.to_arrow_refs()`` in this Ray build RE-EXECUTES a prefix of
    the pipeline's tasks (measured: 12 task executions / 263 rows for an
    8-block / 175-row dataset — ~1.5x duplicate work on the re-run
    blocks, plus double-fired side effects like metric adds).
    ``iter_internal_ref_bundles()`` executes each task exactly once and
    streams the same refs.  Blocks of pandas-backed datasets (map_groups
    / from_pandas producers) are converted to Arrow by a per-block task
    — decided from block METADATA, so the common all-Arrow case (every
    ``batch_format="pyarrow"`` pipeline) ships the original refs with no
    copy."""
    refs: list = []
    all_arrow = True
    for bundle in ds.iter_internal_ref_bundles():
        for ref, md in bundle.blocks:
            refs.append(ref)
            if not isinstance(getattr(md, "schema", None), pa.Schema):
                all_arrow = False
    if all_arrow:
        return refs
    return [_ensure_arrow.remote(r) for r in refs]


@ray.remote
def _ensure_arrow(block) -> pa.Table:
    if isinstance(block, pa.Table):
        return block
    return pa.Table.from_pandas(block, preserve_index=False)


def _row_hash(block: pa.Table, key_cols: list[str]) -> np.ndarray:
    """Deterministic per-row uint64 hash over the key columns."""
    df = pd.DataFrame({c: block[c].to_pandas() for c in key_cols})
    return pd.util.hash_pandas_object(df, index=False).to_numpy()


@ray.remote
def _split_block(block: pa.Table, key_cols: list[str], n_parts: int) -> list[pa.Table | None]:
    if block.num_rows == 0:
        return [None] * n_parts
    part = (_row_hash(block, key_cols) % np.uint64(n_parts)).astype(np.int64)
    order = np.argsort(part, kind="stable")
    sp = part[order]
    out: list[pa.Table | None] = []
    for p in range(n_parts):
        lo = np.searchsorted(sp, p, "left")
        hi = np.searchsorted(sp, p, "right")
        out.append(block.take(pa.array(order[lo:hi])) if hi > lo else None)
    return out


@ray.remote
def _nrows(t: pa.Table | None) -> int:
    return 0 if t is None else t.num_rows


@ray.remote
def _apply_partition(fn, fn_kwargs: dict | None, *slices: pa.Table | None) -> pa.Table | None:
    tabs = [t for t in slices if t is not None and t.num_rows]
    if not tabs:
        return None
    table = pa.concat_tables(tabs, promote_options="default").combine_chunks()
    out = fn(table, **(fn_kwargs or {}))
    if isinstance(out, pd.DataFrame):
        out = pa.Table.from_pandas(out, preserve_index=False)
    return out


def grouped_map(
    ds: "ray.data.Dataset | list",
    key_cols: list[str],
    fn,
    fn_kwargs: dict | None = None,
    n_partitions: int | None = None,
    return_refs: bool = False,
    return_indexed_refs: bool = False,
):
    """Hash-partition ``ds`` by ``key_cols`` and apply ``fn`` once per
    partition (pa.Table -> pa.Table | pd.DataFrame).  ``fn`` sees every
    row of each of its keys and must be vectorized across groups.

    ``ds`` may be a list of Arrow block ObjectRefs instead of a Dataset
    (iterative callers like distributed CC keep everything in plasma and
    skip per-step Dataset executor spin-up); with ``return_refs`` the
    non-empty output partitions come back as refs for the same reason."""
    if n_partitions is None:
        cpus = int(ray.cluster_resources().get("CPU", 8))
        n_partitions = max(8, min(64, cpus))
    refs = ds if isinstance(ds, list) else arrow_refs(ds)
    parted = [
        _split_block.options(num_returns=n_partitions).remote(r, key_cols, n_partitions)
        for r in refs
    ]
    fn_ref = ray.put(fn)  # ship the UDF once, not once per partition task
    out_refs = [
        _apply_partition.remote(fn_ref, fn_kwargs, *[row[p] for row in parted])
        for p in range(n_partitions)
    ]
    # keep only non-empty partitions WITHOUT fetching the tables
    sizes = ray.get([_nrows.remote(r) for r in out_refs])
    if return_indexed_refs:
        # (partition index, ref) pairs — for persistent-bucket writers that
        # need the partition number to be a pure function of the key hash
        return [(p, r) for p, (r, s) in enumerate(zip(out_refs, sizes)) if s]
    done = [r for r, s in zip(out_refs, sizes) if s]
    if return_refs:
        return done
    if not done:
        return ray.data.from_items([])
    return ray.data.from_arrow_refs(done)
